"""Serving-export tests: ``jax.export`` roundtrip of the full predict
path (forward + in-graph NMS) and the config-driven input-spec
derivation (pdanet_tpu/serving.py)."""

import numpy as np

import jax

from model_cfg import tiny_model_cfg

from pdanet_tpu import serving
from pdanet_tpu.models import build_network
from pdanet_tpu.utils.easydict import EasyDict


def _tiny_full_cfg():
    return EasyDict(
        {
            "CLASS_NAMES": ["Car", "Pedestrian", "Cyclist"],
            "MODEL": tiny_model_cfg(),
            "DATA_CONFIG": EasyDict(
                {
                    "POINT_CLOUD_RANGE": [0, -16, -3, 32, 16, 1],
                    "POINT_FEATURE_ENCODING": {
                        "encoding_type": "absolute_coordinates_encoding",
                        "used_feature_list": ["x", "y", "z", "intensity"],
                        "src_feature_list": ["x", "y", "z", "intensity"],
                    },
                    "DATA_PROCESSOR": [
                        {
                            "NAME": "mask_points_and_boxes_outside_range",
                            "REMOVE_OUTSIDE_BOXES": True,
                        },
                        {
                            "NAME": "sample_points",
                            "NUM_POINTS": {"train": 256, "test": 256},
                        },
                        {
                            "NAME": "sort_points",
                            "ENABLED": {"train": True, "test": True},
                        },
                    ],
                }
            ),
        }
    )


def test_export_roundtrip(tmp_path):
    cfg = _tiny_full_cfg()
    model = build_network(cfg.MODEL, num_class=3, input_channels=4)

    batch = serving.example_device_batch(cfg, 2, model)
    assert batch["points"].shape == (2, 256, 4)
    # sort_points present in the pipeline -> x-sorted synthetic cloud
    x = np.asarray(batch["points"][..., 0])
    assert np.all(np.diff(x, axis=1) >= 0)

    variables = jax.jit(
        lambda r, b: model.init(
            {"params": r}, b, train=False, method=model.forward_batch
        )
    )(jax.random.PRNGKey(0), batch)

    exported = serving.export_serving(model, variables, cfg.MODEL, batch)
    path = tmp_path / "tiny.stablehlo"
    nbytes = serving.save_serving(exported, path, meta={"model": "IASSD"})
    assert nbytes > 0 and path.exists()
    assert (tmp_path / "tiny.stablehlo.json").exists()

    predict, reloaded = serving.load_serving(path)
    assert reloaded.platforms == exported.platforms
    got = predict(batch)
    want = serving.make_predict_fn(model, variables, cfg.MODEL)(batch)
    assert set(got.keys()) == set(want.keys())
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]),
            rtol=1e-5, atol=1e-5, err_msg=k,
        )


def test_voxel_input_spec():
    """The voxel triplet is derived from transform_points_to_voxels at the
    TEST-split caps; a PV-RCNN-style DEVICE_BATCH_KEYS adds the raw
    points at the sample_points budget (gt keys excluded)."""
    cfg = EasyDict(
        {
            "DATA_CONFIG": EasyDict(
                {
                    "POINT_CLOUD_RANGE": [0, -40, -3, 70.4, 40, 1],
                    "POINT_FEATURE_ENCODING": {
                        "used_feature_list": ["x", "y", "z", "intensity"],
                    },
                    "DATA_PROCESSOR": [
                        {
                            "NAME": "sample_points",
                            "NUM_POINTS": {"train": 16384, "test": 16384},
                        },
                        {
                            "NAME": "transform_points_to_voxels",
                            "VOXEL_SIZE": [0.05, 0.05, 0.1],
                            "MAX_POINTS_PER_VOXEL": 5,
                            "MAX_NUMBER_OF_VOXELS": {
                                "train": 16000,
                                "test": 40000,
                            },
                        },
                    ],
                }
            ),
        }
    )

    class VoxelStub:
        pass

    spec = serving.serving_input_spec(cfg, 4, VoxelStub())
    assert set(spec) == {"voxels", "voxel_coords", "voxel_num_points"}
    assert spec["voxels"][0] == (4, 40000, 5, 4)
    assert spec["voxel_coords"][0] == (4, 40000, 3)
    assert spec["voxel_num_points"][0] == (4, 40000)

    class PVStub:
        DEVICE_BATCH_KEYS = (
            "voxels", "voxel_coords", "voxel_num_points", "points", "gt_boxes",
        )

    spec = serving.serving_input_spec(cfg, 2, PVStub())
    assert set(spec) == {"voxels", "voxel_coords", "voxel_num_points", "points"}
    assert spec["points"][0] == (2, 16384, 4)

    batch = serving.example_device_batch(cfg, 2, VoxelStub())
    coords = np.asarray(batch["voxel_coords"])
    # z-major coords within the grid (1408, 1600, 40)
    assert coords.shape == (2, 40000, 3)
    assert coords[..., 0].max() < 40
    assert coords[..., 1].max() < 1600
    assert coords[..., 2].max() < 1408


def test_serve_load_cloud_and_sidecar_flags(tmp_path):
    """ADVICE r3: tools/serve.py must (a) fail loudly on an empty cloud,
    (b) mirror the pipeline's sort_points setting recorded in the export
    sidecar instead of unconditionally x-sorting."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    import serve as serve_cli

    # empty cloud -> loud error, not ZeroDivisionError
    empty = tmp_path / "empty.bin"
    empty.write_bytes(b"")
    try:
        serve_cli.load_cloud(str(empty), 16, 4)
        raise AssertionError("expected SystemExit on empty cloud")
    except SystemExit as e:
        assert "empty point cloud" in str(e)

    pts = np.random.RandomState(0).rand(10, 4).astype(np.float32)
    f = tmp_path / "c.bin"
    pts.tofile(f)
    got_sorted = serve_cli.load_cloud(str(f), 8, 4, sort_points=True)
    assert np.all(np.diff(got_sorted[:, 0]) >= 0)
    got_raw = serve_cli.load_cloud(str(f), 8, 4, sort_points=False)
    # no-sort keeps stride-pick order (not x-sorted for this cloud)
    assert not np.all(np.diff(got_raw[:, 0]) >= 0)

    # the sidecar flag derivation follows the processor's test gate
    cfg = _tiny_full_cfg()
    assert serving.test_split_sorts_points(cfg.DATA_CONFIG) is True
    cfg.DATA_CONFIG.DATA_PROCESSOR[2]["ENABLED"] = {
        "train": True, "test": False}
    assert serving.test_split_sorts_points(cfg.DATA_CONFIG) is False
    del cfg.DATA_CONFIG.DATA_PROCESSOR[2]
    assert serving.test_split_sorts_points(cfg.DATA_CONFIG) is False
