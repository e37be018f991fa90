"""Host data processor (numpy) — counterpart of
``pcdet/datasets/processor/data_processor.py``.

Only the processors on the PDA-SSD path are first-class:
``mask_points_and_boxes_outside_range`` (:78-91), ``shuffle_points``
(:93-103), ``sample_points`` (:187-217 — the near/far fixed-budget
subsample that gives the model its static point count).  The voxel
processors are stubbed behind explicit errors (spconv-free build) and the
grid-size helpers are kept for config compatibility.
"""

from functools import partial

import numpy as np

from ...utils import box_utils


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training,
                 num_point_features):
        self.point_cloud_range = np.asarray(point_cloud_range, dtype=np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = "train" if training else "test"
        self.grid_size = self.voxel_size = None
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            self.data_processor_queue.append(
                getattr(self, cur_cfg.NAME)(config=cur_cfg)
            )

    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.mask_points_and_boxes_outside_range, config=config)
        if data_dict.get("points", None) is not None:
            mask = box_utils.mask_points_by_range(
                data_dict["points"], self.point_cloud_range
            )
            data_dict["points"] = data_dict["points"][mask]
        if (
            data_dict.get("gt_boxes", None) is not None
            and config.REMOVE_OUTSIDE_BOXES
            and self.training
        ):
            mask = box_utils.mask_boxes_outside_range_numpy(
                data_dict["gt_boxes"],
                self.point_cloud_range,
                min_num_corners=config.get("min_num_corners", 1),
            )
            data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.shuffle_points, config=config)
        if config.SHUFFLE_ENABLED[self.mode]:
            points = data_dict["points"]
            shuffle_idx = np.random.permutation(points.shape[0])
            data_dict["points"] = points[shuffle_idx]
        return data_dict

    def sort_points(self, data_dict=None, config=None):
        """Spatially order the cloud (sort by x) — TPU-specific step with
        no reference counterpart.  Point order is semantically free (the
        reference itself randomizes it via ``shuffle_points``); a sorted
        order makes the support chunks of the streamed Pallas ball query
        spatially tight, so its AABB chunk-skip test fires (6.6x at the
        ONCE L0 query).  Runs after shuffle/sample so it is the final
        order; training stochasticity survives in ``sample_points``'s
        random subsample and the world augmentations.  Stable sort keeps
        duplicate-coordinate points in prior order (deterministic)."""
        if data_dict is None:
            return partial(self.sort_points, config=config)
        enabled = config.get("ENABLED", {"train": True, "test": True})
        if enabled[self.mode]:
            points = data_dict["points"]
            order = np.argsort(points[:, 0], kind="stable")
            data_dict["points"] = points[order]
        return data_dict

    def sample_points(self, data_dict=None, config=None):
        """Fixed point budget with near(<40 m)/far split (reference
        :187-217) — pad-by-duplicate when short.  This is what makes every
        device tensor static-shape."""
        if data_dict is None:
            return partial(self.sample_points, config=config)
        num_points = config.NUM_POINTS[self.mode]
        if num_points == -1:
            return data_dict
        points = data_dict["points"]
        if num_points < len(points):
            pts_depth = np.linalg.norm(points[:, 0:3], axis=1)
            pts_near_flag = pts_depth < 40.0
            far_idxs_choice = np.where(pts_near_flag == 0)[0]
            near_idxs = np.where(pts_near_flag == 1)[0]
            if num_points > len(far_idxs_choice):
                near_idxs_choice = np.random.choice(
                    near_idxs, num_points - len(far_idxs_choice), replace=False
                )
                choice = (
                    np.concatenate((near_idxs_choice, far_idxs_choice), axis=0)
                    if len(far_idxs_choice) > 0
                    else near_idxs_choice
                )
            else:
                choice = np.arange(0, len(points), dtype=np.int32)
                choice = np.random.choice(choice, num_points, replace=False)
            np.random.shuffle(choice)
        else:
            choice = np.arange(0, len(points), dtype=np.int32)
            if num_points > len(points):
                extra_choice = np.random.choice(choice, num_points - len(points))
                choice = np.concatenate((choice, extra_choice), axis=0)
            np.random.shuffle(choice)
        data_dict["points"] = points[choice]
        return data_dict

    def calculate_grid_size(self, data_dict=None, config=None):
        if data_dict is None:
            grid_size = (
                self.point_cloud_range[3:6] - self.point_cloud_range[0:3]
            ) / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.calculate_grid_size, config=config)
        return data_dict

    def downsample_depth_map(self, data_dict=None, config=None):
        """Block-mean depth-map downsample (reference data_processor.py:
        227-236, skimage downscale_local_mean) — plain numpy here."""
        if data_dict is None:
            self.depth_downsample_factor = config.DOWNSAMPLE_FACTOR
            return partial(self.downsample_depth_map, config=config)
        f = int(self.depth_downsample_factor)
        dm = data_dict["depth_maps"]
        H, W = dm.shape
        ph, pw = (-H) % f, (-W) % f
        if ph or pw:  # zero-pad to a multiple (downscale_local_mean cval=0)
            dm = np.pad(dm, ((0, ph), (0, pw)))
        data_dict["depth_maps"] = dm.reshape(
            (H + ph) // f, f, (W + pw) // f, f
        ).mean(axis=(1, 3)).astype(np.float32)
        return data_dict

    def transform_points_to_voxels_placeholder(self, data_dict=None, config=None):
        if data_dict is None:
            grid_size = (
                self.point_cloud_range[3:6] - self.point_cloud_range[0:3]
            ) / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.transform_points_to_voxels_placeholder, config=config)
        return data_dict

    def transform_points_to_voxels(self, data_dict=None, config=None):
        """Voxelization (spconv Point2VoxelCPU3d replaced by a numpy
        grid-hash voxelizer): first-come point order within a voxel, voxel
        order = order of first appearance, capped points-per-voxel and
        voxel count — the same observable behavior as the spconv CPU
        voxelizer the reference uses (data_processor.py:115-143).

        Point-based models (PDA-SSD/IA-SSD) ignore the voxel outputs; the
        PointPillar/voxel families consume them.
        """
        if data_dict is None:
            grid_size = (
                self.point_cloud_range[3:6] - self.point_cloud_range[0:3]
            ) / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.transform_points_to_voxels, config=config)

        points = data_dict["points"]
        voxel_size = np.asarray(config.VOXEL_SIZE, dtype=np.float32)
        max_pts = int(config.MAX_POINTS_PER_VOXEL)
        max_voxels = int(config.MAX_NUMBER_OF_VOXELS[self.mode])
        pcr = self.point_cloud_range

        from ...native import voxelize as native_voxelize

        native = native_voxelize(
            points, pcr, voxel_size, self.grid_size, max_pts, max_voxels
        )
        if native is not None:
            voxels, voxel_coords, voxel_num_points = native
            data_dict["voxels"] = voxels
            data_dict["voxel_coords"] = voxel_coords
            data_dict["voxel_num_points"] = voxel_num_points
            data_dict["max_number_of_voxels"] = max_voxels
            return data_dict

        coords = np.floor(
            (points[:, 0:3] - pcr[0:3]) / voxel_size
        ).astype(np.int64)
        grid = self.grid_size
        inside = (
            (coords >= 0).all(axis=1)
            & (coords[:, 0] < grid[0])
            & (coords[:, 1] < grid[1])
            & (coords[:, 2] < grid[2])
        )
        points = points[inside]
        coords = coords[inside]
        # voxel id in zyx scan order (reference coords are (z, y, x))
        vid = (coords[:, 2] * grid[1] + coords[:, 1]) * grid[0] + coords[:, 0]
        # first-appearance voxel ordering
        _, first_idx, inverse = np.unique(vid, return_index=True, return_inverse=True)
        order = np.argsort(np.argsort(first_idx))  # rank by first appearance
        slot = order[inverse]
        num_voxels = min(len(first_idx), max_voxels)

        # rank of each point within its voxel (original scan order)
        order_pts = np.argsort(slot, kind="stable")
        sorted_slot = slot[order_pts]
        boundaries = np.concatenate([[0], np.cumsum(np.bincount(sorted_slot))])
        rank_sorted = np.arange(len(points)) - boundaries[sorted_slot]
        rank = np.empty(len(points), dtype=np.int64)
        rank[order_pts] = rank_sorted

        keep = (slot < num_voxels) & (rank < max_pts)
        voxels = np.zeros((num_voxels, max_pts, points.shape[1]), dtype=np.float32)
        voxels[slot[keep], rank[keep]] = points[keep]
        counts = np.bincount(slot, minlength=num_voxels)[:num_voxels]
        voxel_num_points = np.minimum(counts, max_pts).astype(np.int32)
        # first_idx is ordered by voxel id; reorder to first-appearance slots
        voxel_coords = coords[first_idx[np.argsort(order)]][:num_voxels][
            :, ::-1
        ].astype(np.int32)  # zyx

        data_dict["voxels"] = voxels
        data_dict["voxel_coords"] = voxel_coords
        data_dict["voxel_num_points"] = voxel_num_points
        data_dict["max_number_of_voxels"] = max_voxels
        return data_dict

    def sample_points_by_voxels(self, data_dict=None, config=None):
        """Voxel-downsample then budget-sample (reference
        data_processor.py:145-185, the waymo/nuscenes IA-SSD entry):
        voxelize, collapse each voxel to one point (``raw`` keeps the
        first point in scan order, ``mean_vfe`` averages the voxel's
        points), then apply the fixed-budget ``sample_points``.  The
        voxel tensors are consumed here and dropped."""
        if data_dict is None:
            grid_size = (
                self.point_cloud_range[3:6] - self.point_cloud_range[0:3]
            ) / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.sample_points_by_voxels, config=config)

        if config.NUM_POINTS[self.mode] == -1:  # dynamic voxelization
            return data_dict

        data_dict = self.transform_points_to_voxels(data_dict, config=config)
        voxels = data_dict.pop("voxels")
        voxel_num_points = data_dict.pop("voxel_num_points")
        data_dict.pop("voxel_coords")
        data_dict.pop("max_number_of_voxels", None)
        if config.get("SAMPLE_TYPE", "raw") == "mean_vfe":
            data_dict["points"] = (
                voxels.sum(axis=1) / voxel_num_points[:, None]
            ).astype(np.float32)
        else:  # 'raw': keep one point per voxel
            data_dict["points"] = voxels[:, 0]
        return self.sample_points(data_dict, config=config)

    def forward(self, data_dict):
        for cur_processor in self.data_processor_queue:
            data_dict = cur_processor(data_dict=data_dict)
        return data_dict
