"""Host data-pipeline feed rate at REAL cloud sizes (VERDICT r4 next#9).

The r3/r4 2.5 ms/frame feed-rate figure was fixture-scale (~500-pt
clouds).  This probe synthesizes KITTI-scale raw clouds (~120k points,
the real HDL-64 return count), builds the full info + gt-database chain,
and times the TRAIN-split ``__getitem__`` -> collate path — .bin read,
FOV crop (image projection), gt-sampling paste, flip/rot/scale
augmentation, 16384-point budget, sort — through ``SimpleLoader``'s
worker thread pool, reporting frames/sec per worker count next to the
device step time it must outrun.

Matches: reference ``kitti_dataset.py:371-412`` (__getitem__) +
``datasets/__init__.py:66-73`` (4-worker torch DataLoader).

Usage: python tools/probes/host_pipeline_probe.py [frames] [n_bg]
"""

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
os.environ.setdefault("JAX_PLATFORMS", "cpu")  # host-side probe


def main():
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n_bg = int(sys.argv[2]) if len(sys.argv) > 2 else 119000

    import tempfile

    import numpy as np
    from kitti_fixture import build_mini_kitti

    from pdanet_tpu.config import cfg_from_yaml_file
    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    from pdanet_tpu.utils.easydict import EasyDict

    root = Path(tempfile.mkdtemp(prefix="hostpipe_")) / "kitti"
    t0 = time.perf_counter()
    # ~119k bg + 600 car + 400 ped ~= 120k raw points per frame
    build_mini_kitti(root, num_frames=frames, n_bg=n_bg, n_car=600,
                     n_ped=400)
    cfg = cfg_from_yaml_file(
        str(REPO / "tools/cfgs/kitti_models/PDA-SSD.yaml"), EasyDict())
    cfg.DATA_CONFIG.DATA_PATH = str(root)
    create_kitti_infos(cfg.DATA_CONFIG, cfg.CLASS_NAMES, root, root,
                       workers=1)
    print(f"[fixture] {frames} frames x ~{(n_bg + 1000) / 1e3:.0f}k pts "
          f"({time.perf_counter() - t0:.1f}s to build)")

    for workers in (0, 4, 8):
        ds, loader, _ = build_dataloader(
            dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
            batch_size=8, training=True, root_path=root, workers=workers,
        )
        n = 0
        # warm one epoch (page cache, np allocators), then time one
        for _ in loader:
            pass
        t0 = time.perf_counter()
        for batch in loader:
            n += batch["batch_size"]
            assert batch["points"].shape[1] == 16384
        dt = time.perf_counter() - t0
        print(f"[workers={workers}] {n} frames in {dt:.2f}s = "
              f"{n / dt:.1f} frames/sec ({dt / n * 1e3:.1f} ms/frame)")
    print("HOST_PIPELINE_PROBE_OK")


if __name__ == "__main__":
    main()
