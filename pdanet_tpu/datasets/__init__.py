"""Dataset registry + loader — counterpart of
``pcdet/datasets/__init__.py`` (:9-76), minus the phantom nuscenes/waymo/
Roadside imports the reference ships broken (SURVEY.md repo-health note).

The torch DataLoader is replaced by a thin numpy batcher: the pipeline is
pure numpy, batches are dense fixed-shape arrays, and device transfer is a
single ``jax.device_put`` in the train loop.
"""

import numpy as np

from .dataset import DatasetTemplate
from .kitti.kitti_dataset import KittiDataset

__all__ = {
    "DatasetTemplate": DatasetTemplate,
    "KittiDataset": KittiDataset,
}


def _register_once():
    # Imported lazily: the ONCE toolkit is optional (dataset may be absent).
    from .once.once_dataset import ONCEDataset

    __all__["ONCEDataset"] = ONCEDataset
    return ONCEDataset


def get_dataset_class(name):
    if name in __all__:
        return __all__[name]
    if name == "ONCEDataset":
        return _register_once()
    raise KeyError(f"unknown dataset {name}")


class SimpleLoader:
    """Minimal epoch loader: shards sample indices across processes
    (replaces torch DistributedSampler), shuffles per epoch with a seeded
    RNG, and yields dense collated batches."""

    def __init__(self, dataset, batch_size, shuffle, seed=0, rank=0, world=1,
                 drop_last=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.rank = rank
        self.world = world
        self.epoch = 0
        self.drop_last = shuffle if drop_last is None else drop_last

    def set_epoch(self, epoch):
        self.epoch = epoch

    def __len__(self):
        n = len(self.dataset)
        per_rank = (n + self.world - 1) // self.world
        if self.drop_last:
            return per_rank // self.batch_size
        return (per_rank + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        # pad+stride shard (reference eval DistributedSampler :24-44)
        per_rank = (n + self.world - 1) // self.world
        padded = np.concatenate([order, order[: per_rank * self.world - n]])
        my = padded[self.rank :: self.world]
        for start in range(0, len(my), self.batch_size):
            chunk = my[start : start + self.batch_size]
            if self.drop_last and len(chunk) < self.batch_size:
                break
            batch = [self.dataset[int(i)] for i in chunk]
            yield self.dataset.collate_batch(batch)


def build_dataloader(dataset_cfg, class_names, batch_size, dist=False,
                     root_path=None, workers=4, seed=0, logger=None,
                     training=True, merge_all_iters_to_one_epoch=False,
                     total_epochs=0, rank=0, world=1):
    """Mirror of the reference signature (datasets/__init__.py:47-76)."""
    dataset_cls = get_dataset_class(dataset_cfg.DATASET)
    dataset = dataset_cls(
        dataset_cfg=dataset_cfg,
        class_names=class_names,
        root_path=root_path,
        training=training,
        logger=logger,
    )
    if merge_all_iters_to_one_epoch:
        dataset._merge_all_iters_to_one_epoch = True
        dataset.total_epochs = total_epochs
    loader = SimpleLoader(
        dataset, batch_size, shuffle=training, seed=seed, rank=rank, world=world
    )
    return dataset, loader, loader
