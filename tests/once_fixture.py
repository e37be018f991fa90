"""Synthetic mini-ONCE fixture: one sequence with json metadata and
lidar_roof bins, exercising info generation, gt-database creation and the
ONCE __getitem__ path without real data."""

import json
from pathlib import Path

import numpy as np

CLASSES = ["Car", "Bus", "Truck", "Pedestrian", "Cyclist"]


def build_mini_once(root: Path, seq_id="000027", num_frames=3, seed=0):
    root = Path(root)
    seq = root / "data" / seq_id
    (seq / "lidar_roof").mkdir(parents=True, exist_ok=True)
    (root / "ImageSets").mkdir(parents=True, exist_ok=True)

    rng = np.random.RandomState(seed)
    cam_names = ["cam01", "cam03", "cam05", "cam06", "cam07", "cam08", "cam09"]
    # forward-looking camera: cam z -> velo +x, cam x -> velo -y, cam y -> velo -z
    cam_to_velo = np.eye(4)
    cam_to_velo[:3, :3] = np.array([[0, 0, 1], [-1, 0, 0], [0, -1, 0]])
    cam_to_velo[:3, 3] = [0.5, 0.0, 1.8]
    calib = {
        c: {
            "cam_to_velo": cam_to_velo.tolist(),
            "cam_intrinsic": [[1000, 0, 960], [0, 1000, 540], [0, 0, 1]],
            "distortion": [0] * 5,
        }
        for c in cam_names
    }

    frames = []
    frame_ids = [str(1616000000000 + i) for i in range(num_frames)]
    for fid in frame_ids:
        n_bg = 5000
        pts = np.zeros((n_bg, 4), np.float32)
        pts[:, 0] = rng.uniform(-60, 60, n_bg)
        pts[:, 1] = rng.uniform(-60, 60, n_bg)
        pts[:, 2] = rng.uniform(-1.5, 2.0, n_bg)
        pts[:, 3] = rng.uniform(0, 255, n_bg)

        boxes, names = [], []
        for k in range(3):
            cls = CLASSES[rng.randint(len(CLASSES))]
            dims = {
                "Car": [4.4, 1.9, 1.6], "Bus": [11.1, 2.9, 3.4],
                "Truck": [7.5, 2.5, 2.6], "Pedestrian": [0.7, 0.7, 1.7],
                "Cyclist": [2.2, 0.8, 1.4],
            }[cls]
            center = [rng.uniform(-30, 30), rng.uniform(-30, 30), 0.0]
            yaw = float(rng.uniform(-np.pi, np.pi))
            boxes.append(center + dims + [yaw])
            names.append(cls)
            # add points on the object
            local = rng.uniform(-0.45, 0.45, (150, 3)) * np.asarray(dims)
            c, s = np.cos(yaw), np.sin(yaw)
            rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
            obj = local @ rot.T + np.asarray(center)
            pts = np.concatenate(
                [pts, np.concatenate([obj, rng.uniform(0, 255, (150, 1))], 1).astype(np.float32)]
            )
        pts.astype(np.float32).tofile(str(seq / "lidar_roof" / f"{fid}.bin"))
        frames.append(
            {
                "frame_id": fid,
                "pose": [0, 0, 0, 1, 0, 0, 0],
                "annos": {
                    "names": names,
                    "boxes_3d": boxes,
                    "boxes_2d": {c: [[-1, -1, -1, -1]] * len(boxes) for c in cam_names},
                },
            }
        )

    seq_json = {
        "meta_info": {"weather": "sunny", "period": "morning"},
        "calib": calib,
        "frames": frames,
    }
    with open(seq / f"{seq_id}.json", "w") as f:
        json.dump(seq_json, f)

    for split in ["train", "val", "test"]:
        (root / "ImageSets" / f"{split}.txt").write_text(seq_id + "\n")
    return seq_id, frame_ids
