"""Every shipped tools/cfgs YAML must load and construct its detector.

Guards the config surface against registry/key drift: each config goes
through the same ``cfg_from_yaml_file`` + ``build_network`` path the CLIs
use (tools/train.py:118).  Construction only — flax modules are lazy, so
this catches name resolution, required-key, and builder-contract breaks
without tracing a forward.
"""

import glob
import os

import numpy as np
import pytest

from pdanet_tpu.config import cfg_from_yaml_file
from pdanet_tpu.models import build_network
from pdanet_tpu.models.detectors import (
    VOXEL_DETECTORS,
    get_post_processor,
    resolve_detector_name,
)
from pdanet_tpu.utils.easydict import EasyDict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFGS = sorted(
    glob.glob(os.path.join(REPO, "tools/cfgs/*_models/*.yaml"))
)


def _grid_geometry(data_cfg):
    """Derive (grid_size, voxel_size, range) the way DataProcessor does."""
    pc_range = np.asarray(data_cfg.POINT_CLOUD_RANGE, np.float32)
    voxel_size = None
    for proc in data_cfg.DATA_PROCESSOR:
        # calculate_grid_size is CaDDN's voxelizer-free geometry entry
        if proc.NAME in ("transform_points_to_voxels", "calculate_grid_size"):
            voxel_size = proc.VOXEL_SIZE
    if voxel_size is None:
        return None
    voxel_size = np.asarray(voxel_size, np.float32)
    grid = np.round((pc_range[3:] - pc_range[:3]) / voxel_size).astype(int)
    return tuple(int(x) for x in grid), tuple(float(v) for v in voxel_size), \
        tuple(float(x) for x in pc_range)


@pytest.mark.parametrize(
    "path", CFGS, ids=[os.path.basename(p)[:-5] for p in CFGS]
)
def test_config_builds(path):
    cfg = cfg_from_yaml_file(path, EasyDict())
    assert cfg.CLASS_NAMES, path
    num_class = len(cfg.CLASS_NAMES)
    kwargs = {}
    name = resolve_detector_name(cfg.MODEL)
    if name in VOXEL_DETECTORS:
        geom = _grid_geometry(cfg.DATA_CONFIG)
        assert geom is not None, f"{path}: voxel detector without voxelizer"
        kwargs = {
            "grid_size": geom[0],
            "voxel_size": geom[1],
            "point_cloud_range": geom[2],
            "class_names": tuple(cfg.CLASS_NAMES),
        }
    model = build_network(cfg.MODEL, num_class=num_class, **kwargs)
    assert model is not None
    # eval post-processing resolves for every family
    assert get_post_processor(name) is not None
