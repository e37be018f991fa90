"""Serving export — self-contained AOT deployment artifacts.

The reference has no deployment story beyond ``tools/test.py`` (a live
PyTorch process re-loading a ``.pth``).  The TPU-native serving path uses
``jax.export``: the full predict function — forward pass plus the in-graph
NMS post-processing of ``detector3d_template.post_processing``
(detector3d_template.py:179-285 semantics) — is staged to StableHLO with
the trained weights baked in as constants and serialized into one file.

Properties of the artifact:

- **self-contained**: the serialized artifact deserializes and runs with
  jax/jaxlib alone via ``jax.export.deserialize`` — no YAML config system,
  no checkpoint pickle, no pdanet_tpu import required on the serving host
  (``load_serving`` below is a convenience wrapper that lives in this
  package; frontends that must avoid importing pdanet_tpu can inline its
  four lines);
- **static shapes end-to-end**: inputs are the exact dense device batch
  the data pipeline emits (``(B, N, C)`` points / padded voxel triplet),
  outputs the fixed-shape ``pred_boxes / pred_scores / pred_labels /
  pred_counts`` dict, so a serving frontend never triggers a recompile;
- **cross-platform lowering**: ``platforms=("tpu",)`` lowers for TPU from
  a CPU-only build host (XLA re-compiles the embedded StableHLO on the
  serving machine, so TPU-generation portability comes for free).

Input shapes are derived from ``DATA_CONFIG`` exactly the way
``DatasetTemplate``/``DataProcessor`` derive them (``sample_points``
budget, ``transform_points_to_voxels`` caps — data_processor.py:115-217),
using the *test*-split budgets.
"""

import json

import numpy as np

import jax
import jax.numpy as jnp

_EXCLUDED_KEYS = ("gt_boxes", "gt_boxes2d")


def _processor_map(data_cfg):
    return {p["NAME"]: p for p in data_cfg.DATA_PROCESSOR}


def test_split_sorts_points(data_cfg):
    """True iff the pipeline x-sorts clouds on the test split
    (``data_processor.sort_points``, ENABLED defaults to on).  Exported
    artifact sidecars record this so ``tools/serve.py`` mirrors the
    exact serve-time preprocessing."""
    procs = _processor_map(data_cfg)
    if "sort_points" not in procs:
        return False
    enabled = procs["sort_points"].get("ENABLED", {"train": True, "test": True})
    return bool(enabled["test"])


def _test_budget(value):
    """Processor budgets are either a plain int or a {'train','test'} map."""
    if isinstance(value, dict):
        return int(value["test"])
    return int(value)


def serving_input_spec(cfg, batch_size, model):
    """``{key: (shape, dtype)}`` for the detector's device batch.

    Mirrors ``select_device_batch`` (train/train_utils.py:27-39): the
    model's ``DEVICE_BATCH_KEYS`` when declared, otherwise the voxel
    triplet for voxelizing pipelines and the dense point cloud for the
    rest.  gt keys are eval-only extras and excluded.
    """
    data_cfg = cfg.DATA_CONFIG
    procs = _processor_map(data_cfg)
    num_feats = len(data_cfg.POINT_FEATURE_ENCODING["used_feature_list"])

    keys = getattr(model, "DEVICE_BATCH_KEYS", None)
    if keys is None:
        keys = (
            ("voxels", "voxel_coords", "voxel_num_points")
            if "transform_points_to_voxels" in procs
            else ("points",)
        )
    keys = tuple(k for k in keys if k not in _EXCLUDED_KEYS)

    spec = {}
    for key in keys:
        if key == "points":
            if "sample_points" not in procs:
                raise ValueError(
                    "serving export of a model whose device batch carries "
                    "'points' requires a `sample_points` DATA_PROCESSOR "
                    "entry: its NUM_POINTS budget is what fixes the static "
                    "(B, N, C) point-cloud shape the AOT artifact is traced "
                    "at (data_processor.py sample_points semantics). "
                    "Pipelines without it have no config-derivable point "
                    "budget."
                )
            n = _test_budget(procs["sample_points"]["NUM_POINTS"])
            spec[key] = ((batch_size, n, num_feats), jnp.float32)
        elif key == "voxels":
            p = procs["transform_points_to_voxels"]
            v = _test_budget(p["MAX_NUMBER_OF_VOXELS"])
            spec[key] = (
                (batch_size, v, int(p["MAX_POINTS_PER_VOXEL"]), num_feats),
                jnp.float32,
            )
        elif key == "voxel_coords":
            p = procs["transform_points_to_voxels"]
            v = _test_budget(p["MAX_NUMBER_OF_VOXELS"])
            spec[key] = ((batch_size, v, 3), jnp.int32)
        elif key == "voxel_num_points":
            p = procs["transform_points_to_voxels"]
            v = _test_budget(p["MAX_NUMBER_OF_VOXELS"])
            spec[key] = ((batch_size, v), jnp.int32)
        else:
            raise NotImplementedError(
                f"serving export does not cover device-batch key {key!r} "
                "(the camera-family CaDDN pipeline carries per-frame "
                "image/calibration tensors whose shapes live in the data, "
                "not the config)"
            )
    return spec


def example_device_batch(cfg, batch_size, model, seed=0):
    """Synthetic device batch at the exact serving shapes (for tracing,
    export verification, and warmup).  Point coordinates are spread over
    ``POINT_CLOUD_RANGE`` and x-sorted when the pipeline carries the
    ``sort_points`` step (so the streamed ball query's chunk-skip sees a
    representative cloud)."""
    spec = serving_input_spec(cfg, batch_size, model)
    procs = _processor_map(cfg.DATA_CONFIG)
    pc_range = np.asarray(cfg.DATA_CONFIG.POINT_CLOUD_RANGE, np.float32)
    rs = np.random.RandomState(seed)

    batch = {}
    for key, (shape, dtype) in spec.items():
        if key == "points":
            pts = np.zeros(shape, np.float32)
            pts[..., :3] = rs.uniform(pc_range[:3], pc_range[3:6], shape[:2] + (3,))
            if test_split_sorts_points(cfg.DATA_CONFIG):
                order = np.argsort(pts[..., 0], axis=1)
                pts = np.take_along_axis(pts, order[..., None], axis=1)
            batch[key] = jnp.asarray(pts)
        elif key == "voxels":
            vox = np.zeros(shape, np.float32)
            vox[..., :3] = rs.uniform(pc_range[:3], pc_range[3:6], shape[:3] + (3,))
            batch[key] = jnp.asarray(vox)
        elif key == "voxel_coords":
            p = procs["transform_points_to_voxels"]
            voxel_size = np.asarray(p["VOXEL_SIZE"], np.float32)
            grid = np.round((pc_range[3:6] - pc_range[:3]) / voxel_size).astype(int)
            # z-major (z, y, x) like the voxelizer emits
            coords = np.stack(
                [
                    rs.randint(0, grid[2], shape[:2]),
                    rs.randint(0, grid[1], shape[:2]),
                    rs.randint(0, grid[0], shape[:2]),
                ],
                axis=-1,
            )
            batch[key] = jnp.asarray(coords, jnp.int32)
        elif key == "voxel_num_points":
            p = procs["transform_points_to_voxels"]
            batch[key] = jnp.full(shape, int(p["MAX_POINTS_PER_VOXEL"]), jnp.int32)
    return batch


def make_predict_fn(model, variables, model_cfg):
    """The serving closure: forward + per-family post-processing, weights
    captured as constants."""
    from .models.detectors import get_post_processor

    post_fn = get_post_processor(model_cfg.NAME)

    def predict(batch):
        out = model.apply(
            variables, batch, train=False, method=model.forward_batch
        )
        return post_fn(out, model_cfg)

    return predict


def export_serving(model, variables, model_cfg, example_batch, platforms=None):
    """Stage the predict fn to a ``jax.export.Exported`` artifact.

    ``platforms``: lowering targets (e.g. ``("tpu",)`` or
    ``("tpu", "cpu")``); default = the exporting host's backend.
    """
    from jax import export as jax_export

    predict = make_predict_fn(model, variables, model_cfg)
    arg_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), dict(example_batch)
    )
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(platforms)
    return jax_export.export(jax.jit(predict), **kwargs)(arg_spec)


def save_serving(exported, path, meta=None):
    """Write the serialized artifact (+ optional JSON sidecar at
    ``<path>.json`` describing the I/O contract for frontend authors)."""
    data = exported.serialize()
    with open(path, "wb") as f:
        f.write(data)
    if meta is not None:
        with open(str(path) + ".json", "w") as f:
            json.dump(meta, f, indent=2, default=str)
    return len(data)


def load_serving(path):
    """Load an artifact and return ``(predict, exported)``.  ``predict``
    takes the device-batch dict and returns the fixed-shape pred dict —
    no pdanet_tpu imports on this path beyond jax itself."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())

    def predict(batch):
        return exported.call(dict(batch))

    return predict, exported
