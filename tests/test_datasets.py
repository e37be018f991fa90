"""Host pipeline tests on the synthetic mini-KITTI fixture: info
generation, gt-database creation, __getitem__ -> prepare_data -> dense
collate, augmentations, and the KITTI official-eval plumbing."""

import numpy as np
import pytest

from kitti_fixture import build_mini_kitti

from pdanet_tpu.utils.easydict import EasyDict

KITTI_DATA_CFG = {
    "DATASET": "KittiDataset",
    "DATA_PATH": "",  # filled per-fixture
    "POINT_CLOUD_RANGE": [0, -40, -3, 70.4, 40, 1],
    "DATA_SPLIT": {"train": "train", "test": "val"},
    "INFO_PATH": {"train": ["kitti_infos_train.pkl"], "test": ["kitti_infos_val.pkl"]},
    "GET_ITEM_LIST": ["points"],
    "FOV_POINTS_ONLY": False,  # synthetic cloud is lidar-frame only
    "DATA_AUGMENTOR": {
        "DISABLE_AUG_LIST": ["placeholder"],
        "AUG_CONFIG_LIST": [
            {
                "NAME": "gt_sampling",
                "USE_ROAD_PLANE": False,
                "DB_INFO_PATH": ["kitti_dbinfos_train.pkl"],
                "PREPARE": {
                    "filter_by_min_points": ["Car:5", "Pedestrian:5", "Cyclist:5"],
                    "filter_by_difficulty": [-1],
                },
                "SAMPLE_GROUPS": ["Car:3", "Pedestrian:2", "Cyclist:2"],
                "NUM_POINT_FEATURES": 4,
                "DATABASE_WITH_FAKELIDAR": False,
                "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                "LIMIT_WHOLE_SCENE": True,
            },
            {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
            {"NAME": "random_world_rotation", "WORLD_ROT_ANGLE": [-0.78539816, 0.78539816]},
            {"NAME": "random_world_scaling", "WORLD_SCALE_RANGE": [0.95, 1.05]},
        ],
    },
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "sample_points", "NUM_POINTS": {"train": 2048, "test": 2048}},
        {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}},
    ],
}

CLASS_NAMES = ["Car", "Pedestrian", "Cyclist"]


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mini_kitti")
    build_mini_kitti(root, num_frames=3)
    # generate infos + gt database once
    from pdanet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos

    cfg = EasyDict(dict(KITTI_DATA_CFG))
    cfg.DATA_PATH = str(root)
    create_kitti_infos(cfg, CLASS_NAMES, root, root, workers=1)
    return root


def _build(kitti_root, training):
    from pdanet_tpu.datasets import build_dataloader

    cfg = EasyDict(dict(KITTI_DATA_CFG))
    cfg.DATA_PATH = str(kitti_root)
    return build_dataloader(
        dataset_cfg=cfg, class_names=CLASS_NAMES, batch_size=2,
        training=training, root_path=kitti_root,
    )


def test_infos_and_gt_database(kitti_root):
    import pickle

    with open(kitti_root / "kitti_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    anno = infos[0]["annos"]
    assert set(anno["name"]) == {"Car", "Pedestrian"}
    assert anno["gt_boxes_lidar"].shape[1] == 7
    # objects carry points
    assert (anno["num_points_in_gt"][:2] > 50).all()

    with open(kitti_root / "kitti_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert len(db["Car"]) == 3 and len(db["Pedestrian"]) == 3


def test_train_getitem_and_collate(kitti_root):
    np.random.seed(0)
    dataset, loader, _ = _build(kitti_root, training=True)
    batch = next(iter(loader))
    assert batch["points"].shape == (2, 2048, 4)
    assert batch["gt_boxes"].ndim == 3 and batch["gt_boxes"].shape[2] == 8
    # gt-sampling should have topped up scene objects (3 Car target)
    assert batch["gt_boxes"].shape[1] >= 2
    classes = batch["gt_boxes"][..., 7]
    assert set(np.unique(classes)).issubset({0.0, 1.0, 2.0, 3.0})


def test_eval_getitem_deterministic(kitti_root):
    dataset, loader, _ = _build(kitti_root, training=False)
    np.random.seed(1024)
    a = dataset[0]["points"]
    np.random.seed(1024)
    b = dataset[0]["points"]
    np.testing.assert_array_equal(a, b)


def _synth_kitti_annos(num_frames=60, seed=3):
    """Synthetic camera-frame gt annos dense enough for a full 41-point PR
    curve (the official R40 AP needs >= 40 distinct recall levels, so tiny
    fixtures can never reach 100)."""
    rng = np.random.RandomState(seed)
    gt_annos = []
    for _ in range(num_frames):
        n = rng.randint(2, 5)
        names = rng.choice(["Car", "Pedestrian"], n)
        dims = np.where(
            (names == "Car")[:, None], [3.9, 1.56, 1.6], [0.9, 1.73, 0.6]
        ) * rng.uniform(0.9, 1.1, (n, 3))
        anno = {
            "name": names,
            "truncated": np.zeros(n),
            "occluded": np.zeros(n),
            "alpha": rng.uniform(-np.pi, np.pi, n),
            # tall boxes -> all "easy"
            "bbox": np.stack(
                [np.full(n, 300.0), np.full(n, 120.0), np.full(n, 420.0),
                 np.full(n, 280.0)], axis=1,
            ),
            "dimensions": dims,  # l, h, w camera
            "location": np.stack(
                [rng.uniform(-15, 15, n), rng.uniform(1.2, 1.8, n),
                 rng.uniform(5, 50, n)], axis=1,
            ),
            "rotation_y": rng.uniform(-np.pi, np.pi, n),
        }
        gt_annos.append(anno)
    return gt_annos


def test_kitti_eval_on_perfect_predictions():
    """Feeding gt back as detections (distinct scores) must give ~100 AP
    across bbox/bev/3d metrics — sanity for the official-eval port."""
    from pdanet_tpu.datasets.kitti.kitti_object_eval_python import eval as kitti_eval

    rng = np.random.RandomState(0)
    gt_annos = _synth_kitti_annos()
    det_annos = []
    for a in gt_annos:
        d = {k: np.copy(v) for k, v in a.items()}
        d["score"] = rng.uniform(0.3, 1.0, len(a["name"]))
        det_annos.append(d)
    result_str, result_dict = kitti_eval.get_official_eval_result(
        gt_annos, det_annos, ["Car", "Pedestrian", "Cyclist"]
    )
    assert result_dict["Car_3d/easy_R40"] > 97.0, result_str
    assert result_dict["Car_bev/easy_R40"] > 97.0, result_str
    assert result_dict["Pedestrian_3d/easy_R40"] > 97.0, result_str
    assert result_dict["Car_image/easy_R40"] > 97.0, result_str


def test_once_eval_on_perfect_predictions():
    """ONCE protocol sanity: gt as detections -> ~100 AP."""
    from pdanet_tpu.datasets.once.once_eval.evaluation import get_evaluation_results

    rng = np.random.RandomState(0)
    gt_annos, det_annos = [], []
    names_pool = ["Car", "Bus", "Truck", "Pedestrian", "Cyclist"]
    for _ in range(4):
        n = 5
        boxes = np.stack(
            [
                rng.uniform(-40, 40, n), rng.uniform(-40, 40, n),
                rng.uniform(-1, 1, n), rng.uniform(1.5, 8, n),
                rng.uniform(1.5, 3, n), rng.uniform(1.2, 3.5, n),
                rng.uniform(-np.pi, np.pi, n),
            ],
            axis=-1,
        )
        names = np.array([names_pool[i % 5] for i in range(n)])
        gt_annos.append({"name": names, "boxes_3d": boxes})
        det_annos.append(
            {"name": names, "boxes_3d": boxes, "score": np.ones(n) * 0.9}
        )
    result_str, result_dict = get_evaluation_results(
        gt_annos, det_annos, list(names_pool)
    )
    assert result_dict["AP_Vehicle/overall"] > 99.0, result_str
    assert result_dict["AP_Pedestrian/overall"] > 99.0, result_str
    assert result_dict["AP_Cyclist/overall"] > 99.0, result_str


ONCE_DATA_CFG = {
    "DATASET": "ONCEDataset",
    "DATA_PATH": "",
    "POINT_CLOUD_RANGE": [-75.2, -75.2, -5.0, 75.2, 75.2, 3.0],
    "INFO_PATH": {
        "train": ["once_infos_train.pkl"],
        "val": ["once_infos_val.pkl"],
        "test": ["once_infos_test.pkl"],
    },
    "DATA_SPLIT": {"train": "train", "test": "val"},
    "DATA_AUGMENTOR": {
        "DISABLE_AUG_LIST": ["placeholder"],
        "AUG_CONFIG_LIST": [
            {
                "NAME": "gt_sampling",
                "USE_ROAD_PLANE": False,
                "DB_INFO_PATH": ["once_dbinfos_train.pkl"],
                "PREPARE": {
                    "filter_by_min_points": [
                        "Car:5", "Bus:5", "Truck:5", "Pedestrian:5", "Cyclist:5"
                    ],
                },
                "SAMPLE_GROUPS": ["Car:2", "Bus:1", "Truck:1", "Pedestrian:1", "Cyclist:1"],
                "NUM_POINT_FEATURES": 4,
                "REMOVE_EXTRA_WIDTH": [0.0, 0.0, 0.0],
                "LIMIT_WHOLE_SCENE": True,
            },
            {"NAME": "random_world_flip", "ENABLE_PROB": 0.5, "ALONG_AXIS_LIST": ["x", "y"]},
            {"NAME": "random_world_rotation", "ENABLE_PROB": 0.5,
             "WORLD_ROT_ANGLE": [-0.78539816, 0.78539816]},
            {"NAME": "random_world_scaling", "ENABLE_PROB": 0.5,
             "WORLD_SCALE_RANGE": [0.9, 1.1]},
        ],
    },
    "POINT_FEATURE_ENCODING": {
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": ["x", "y", "z", "intensity"],
        "src_feature_list": ["x", "y", "z", "intensity"],
    },
    "DATA_PROCESSOR": [
        {"NAME": "mask_points_and_boxes_outside_range", "REMOVE_OUTSIDE_BOXES": True},
        {"NAME": "sample_points", "NUM_POINTS": {"train": 4096, "test": 4096}},
        {"NAME": "shuffle_points", "SHUFFLE_ENABLED": {"train": True, "test": False}},
    ],
}

ONCE_CLASSES = ["Car", "Bus", "Truck", "Pedestrian", "Cyclist"]


@pytest.fixture(scope="module")
def once_root(tmp_path_factory):
    from once_fixture import build_mini_once

    root = tmp_path_factory.mktemp("mini_once")
    build_mini_once(root, num_frames=3)
    from pdanet_tpu.datasets.once.once_dataset import create_once_infos

    cfg = EasyDict(dict(ONCE_DATA_CFG))
    cfg.DATA_PATH = str(root)
    create_once_infos(cfg, ONCE_CLASSES, root, root, workers=1)
    return root


def test_once_infos_and_getitem(once_root):
    import pickle

    with open(once_root / "once_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 3
    assert infos[0]["annos"]["boxes_3d"].shape[1] == 7
    assert (infos[0]["annos"]["num_points_in_gt"] > 50).all()

    from pdanet_tpu.datasets import build_dataloader

    cfg = EasyDict(dict(ONCE_DATA_CFG))
    cfg.DATA_PATH = str(once_root)
    np.random.seed(0)
    dataset, loader, _ = build_dataloader(
        dataset_cfg=cfg, class_names=ONCE_CLASSES, batch_size=2,
        training=True, root_path=once_root,
    )
    batch = next(iter(loader))
    assert batch["points"].shape == (2, 4096, 4)
    assert batch["gt_boxes"].shape[2] == 8
    with open(once_root / "once_dbinfos_train.pkl", "rb") as f:
        db = pickle.load(f)
    assert sum(len(v) for v in db.values()) == 9  # 3 frames x 3 objects


def test_kitti_matcher_vectorized_vs_sequential():
    """compute_statistics_all_thresholds must reproduce the per-threshold
    python matcher exactly (tp/fp/fn and AOS similarity)."""
    from pdanet_tpu.datasets.kitti.kitti_object_eval_python.eval import (
        compute_statistics,
        compute_statistics_all_thresholds,
    )

    rng = np.random.RandomState(4)
    for trial in range(8):
        num_gt = rng.randint(1, 10)
        num_dt = rng.randint(0, 14)
        overlaps = rng.rand(num_dt, num_gt)
        gt_datas = np.concatenate(
            [rng.rand(num_gt, 4) * 300, rng.uniform(-3, 3, (num_gt, 1))], axis=1
        )
        dt_datas = np.concatenate(
            [rng.rand(num_dt, 4) * 300, rng.uniform(-3, 3, (num_dt, 1)),
             rng.rand(num_dt, 1)], axis=1,
        )
        ignored_gt = rng.choice([-1, 0, 1], num_gt).tolist()
        ignored_det = rng.choice([-1, 0, 1], num_dt).tolist()
        dc_bboxes = [rng.rand(4) * 300 for _ in range(rng.randint(0, 3))]
        thresholds = np.sort(rng.rand(7))[::-1]
        metric = trial % 3

        vec = compute_statistics_all_thresholds(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det, dc_bboxes,
            metric, min_overlap=0.5, thresholds=thresholds, compute_aos=True,
        )
        for t, th in enumerate(thresholds):
            tp, fp, fn, sim, _ = compute_statistics(
                overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                dc_bboxes, metric, min_overlap=0.5, thresh=th,
                compute_fp=True, compute_aos=True,
            )
            assert vec[t, 0] == tp, (trial, t, "tp", vec[t, 0], tp)
            assert vec[t, 1] == fp, (trial, t, "fp", vec[t, 1], fp)
            assert vec[t, 2] == fn, (trial, t, "fn", vec[t, 2], fn)
            ref_sim = sim if sim != -1 else -1
            if ref_sim == -1:
                assert vec[t, 3] == -1, (trial, t, "sim")
            else:
                np.testing.assert_allclose(vec[t, 3], ref_sim, rtol=1e-9)


def test_once_matcher_vectorized_vs_sequential():
    """The ONCE eval's compute_statistics_all_thresholds must reproduce
    the per-threshold python matcher exactly (the greedy best-IoU flag-0 /
    first flag-1 semantics of reference evaluation.py:217-263), across
    random gt/pred flag mixes, duplicate IoUs (tie-break), and empty
    pred sets."""
    from pdanet_tpu.datasets.once.once_eval.evaluation import (
        compute_statistics,
        compute_statistics_all_thresholds,
    )

    rng = np.random.RandomState(9)
    for trial in range(12):
        num_gt = rng.randint(1, 12)
        num_pred = rng.randint(0, 16)
        # quantized IoUs force ties through the argmax tie-break path
        iou = np.round(rng.rand(num_gt, num_pred), 1)
        scores = rng.rand(num_pred)
        gt_flag = rng.choice([-1, 0, 1], num_gt)
        pred_flag = rng.choice([-1, 0, 1], num_pred)
        thresholds = np.sort(rng.rand(9))[::-1]
        iou_th = 0.3

        vec = compute_statistics_all_thresholds(
            iou, scores, gt_flag, pred_flag, thresholds, iou_th
        )
        for t, th in enumerate(thresholds):
            tp, fp, fn = compute_statistics(
                iou, scores, gt_flag, pred_flag,
                score_threshold=th, iou_threshold=iou_th,
            )
            assert (vec[t] == [tp, fp, fn]).all(), (
                trial, t, vec[t].tolist(), [tp, fp, fn])


def test_once_point_painting_matches_grid_sample(once_root):
    """point_painting must reproduce the reference's torch grid_sample math
    (once_dataset.py:86-122): one-hot seg map, bilinear, zeros padding,
    align_corners=False."""
    import pickle

    import torch
    import torch.nn.functional as F
    from PIL import Image

    from pdanet_tpu.datasets.once.once_dataset import ONCEDataset

    with open(once_root / "once_infos_train.pkl", "rb") as f:
        infos = pickle.load(f)
    info = infos[0]
    seq_id, frame_id = info["sequence_id"], info["frame_id"]

    # synthetic label map for cam03 only (sized to the fixture intrinsics:
    # cx=960, cy=540 -> 1920x1080 image); ids 6,7 = unused classes
    rng = np.random.RandomState(7)
    H, W = 1080, 1920
    seg = rng.randint(0, 8, (H, W)).astype(np.uint8)
    semseg = once_root / "semseg"
    (semseg / seq_id / "cam03").mkdir(parents=True)
    Image.fromarray(seg).save(semseg / seq_id / "cam03" / f"{frame_id}_label.png")

    cfg = EasyDict(dict(ONCE_DATA_CFG))
    cfg.DATA_PATH = str(once_root)
    cfg.POINT_PAINTING = True
    cfg.SEMSEG_DIR = str(semseg)
    # gt-sampling pastes 4-feature db objects — incompatible with painted
    # 10-feature clouds (same constraint as the reference's db sampler)
    cfg.DATA_AUGMENTOR = EasyDict({
        "DISABLE_AUG_LIST": ["gt_sampling"],
        "AUG_CONFIG_LIST": [
            {"NAME": "random_world_flip", "ALONG_AXIS_LIST": ["x"]},
        ],
    })
    # name the painted channels so the feature encoder keeps them
    names = ["x", "y", "z", "intensity"] + [f"seg{i}" for i in range(6)]
    cfg.POINT_FEATURE_ENCODING = EasyDict({
        "encoding_type": "absolute_coordinates_encoding",
        "used_feature_list": names, "src_feature_list": names,
    })
    ds = ONCEDataset(
        dataset_cfg=cfg, class_names=ONCE_CLASSES, training=True,
        root_path=once_root,
    )
    points = ds.get_lidar(seq_id, frame_id)[:512]
    painted = ds.point_painting(points, info)
    assert painted.shape == (512, 4 + 6)
    np.testing.assert_array_equal(painted[:, :4], points)

    # torch oracle — the reference's exact formulation
    calib = info["calib"]["cam03"]
    cam_2_velo = np.asarray(calib["cam_to_velo"], np.float64)
    intr = np.hstack([np.asarray(calib["cam_intrinsic"], np.float64), np.zeros((3, 1))])
    homo = np.hstack([points[:, :3], np.ones((points.shape[0], 1))])
    pts_cam = homo @ np.linalg.inv(cam_2_velo).T
    mask = pts_cam[:, 2] > 0
    img_pts = pts_cam[mask] @ intr.T
    img_pts = img_pts / img_pts[:, [2]]
    uv = img_pts[:, :2].copy()
    one_hot = np.zeros((H * W, 6), np.float32)
    flat = seg.reshape(-1)
    for ci in range(6):
        one_hot[flat == ci, ci] = 1.0
    feats = torch.from_numpy(one_hot.reshape(H, W, 6).transpose(2, 0, 1))[None]
    uv[:, 0] = (uv[:, 0] - W / 2) / (W / 2)
    uv[:, 1] = (uv[:, 1] - H / 2) / (H / 2)
    # double precision: f32 grid coords (~1e3 px) quantize at the 1e-4 px
    # level and flip floor cells vs the numpy path at cell boundaries
    grid = torch.from_numpy(uv)[None, None].double()
    ref = F.grid_sample(feats.double(), grid, mode="bilinear",
                        padding_mode="zeros", align_corners=False)
    ref = ref.squeeze(0).squeeze(1).transpose(0, 1).numpy()
    expected = np.zeros((points.shape[0], 6), np.float32)
    expected[mask] = ref
    np.testing.assert_allclose(painted[:, 4:], expected, atol=2e-5)
    # the projection must actually hit the map for a meaningful check
    assert (expected.sum(axis=1) > 0.5).sum() > 20

    # __getitem__ plumbs the painted channels through prepare_data
    idx = next(i for i, inf in enumerate(ds.once_infos)
               if inf["frame_id"] == frame_id)
    item = ds[idx]
    assert item["points"].shape[1] == 10


def test_sort_points_processor():
    """``sort_points`` (TPU-specific, no reference counterpart) emits the
    same point set ordered by x, honoring the per-mode ENABLED switch."""
    from pdanet_tpu.datasets.processor.data_processor import DataProcessor

    pcr = np.asarray([0, -8, -3, 16, 8, 1], np.float32)
    rng = np.random.RandomState(3)
    pts = rng.uniform(0, 16, (64, 4)).astype(np.float32)
    cfg = EasyDict(
        {"NAME": "sort_points", "ENABLED": {"train": True, "test": False}}
    )
    dp = DataProcessor([cfg], pcr, training=True, num_point_features=4)
    out = dp.forward({"points": pts.copy()})["points"]
    assert (np.diff(out[:, 0]) >= 0).all()
    np.testing.assert_array_equal(
        np.sort(out, axis=0), np.sort(pts, axis=0)
    )  # permutation, nothing dropped
    dp_eval = DataProcessor([cfg], pcr, training=False, num_point_features=4)
    out_eval = dp_eval.forward({"points": pts.copy()})["points"]
    np.testing.assert_array_equal(out_eval, pts)  # test-mode disabled


def test_sample_points_by_voxels():
    """Voxel-downsample-then-sample (reference data_processor.py:145-185):
    'raw' keeps each voxel's first point in scan order, 'mean_vfe'
    averages, and the fixed budget is applied afterwards."""
    from pdanet_tpu.datasets.processor.data_processor import DataProcessor

    pcr = np.asarray([0, -8, -3, 16, 8, 1], np.float32)
    base = {
        "VOXEL_SIZE": [0.5, 0.5, 4.0],
        "MAX_POINTS_PER_VOXEL": 8,
        "MAX_NUMBER_OF_VOXELS": {"train": 512, "test": 512},
        "NUM_POINTS": {"train": 16, "test": 16},
    }
    pts = np.array(
        [
            [0.1, 0.1, 0.0, 1.0],   # voxel A, first point
            [0.2, 0.2, 0.1, 3.0],   # voxel A, second point
            [5.0, 3.0, -1.0, 5.0],  # voxel B
        ],
        np.float32,
    )

    def run(sample_type):
        cfg = EasyDict(dict(base, NAME="sample_points_by_voxels",
                            SAMPLE_TYPE=sample_type))
        dp = DataProcessor([cfg], pcr, training=True, num_point_features=4)
        np.random.seed(0)
        return dp.forward({"points": pts.copy()})

    out = run("raw")
    assert out["points"].shape == (16, 4)  # padded up to the budget
    assert "voxels" not in out and "voxel_coords" not in out
    # every output row is one of the per-voxel representatives
    reps = {tuple(pts[0]), tuple(pts[2])}
    assert {tuple(r) for r in out["points"]} == reps

    out = run("mean_vfe")
    mean_a = tuple(pts[:2].mean(axis=0))
    assert {tuple(r) for r in np.round(out["points"], 5)} == {
        tuple(np.round(mean_a, 5)), tuple(pts[2])}
