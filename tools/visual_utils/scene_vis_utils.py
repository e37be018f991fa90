"""3D scene visualization — counterpart of the reference's debug viewers
(``tools/visual_utils/open3d_vis_utils.py:41-132`` draw_scenes and the
mayavi ``visualize_utils.py:142-199``).

Same entry point, ``draw_scenes(points, gt_boxes, ref_boxes, ...)``, with
two backends picked at runtime:

* **open3d** when importable and a display is available — interactive
  point cloud + wireframe boxes, gt in blue, predictions in green (the
  reference's color convention, open3d_vis_utils.py:110-131);
* **matplotlib 3D** otherwise (this image has no GUI stack) — renders the
  same scene headless to a PNG via ``save_path``.

No torch/mayavi dependency; inputs are numpy arrays.
"""

import numpy as np

# 12 wireframe edges of a 3D box over the 8-corner layout produced by
# box_to_corners (4 bottom, 4 top, 4 verticals)
_BOX_EDGES = [
    (0, 1), (1, 2), (2, 3), (3, 0),
    (4, 5), (5, 6), (6, 7), (7, 4),
    (0, 4), (1, 5), (2, 6), (3, 7),
]


def box_to_corners(box):
    """(7,) [x y z dx dy dz heading] -> (8, 3) corners, bottom 4 first."""
    dx, dy, dz = box[3] / 2.0, box[4] / 2.0, box[5] / 2.0
    corners = np.array(
        [
            [dx, dy, -dz], [dx, -dy, -dz], [-dx, -dy, -dz], [-dx, dy, -dz],
            [dx, dy, dz], [dx, -dy, dz], [-dx, -dy, dz], [-dx, dy, dz],
        ],
        dtype=np.float32,
    )
    c, s = np.cos(box[6]), np.sin(box[6])
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    return corners @ rot.T + box[0:3]


def _try_open3d():
    try:
        import open3d  # noqa: F401

        return open3d
    except ImportError:
        return None


def _draw_open3d(o3d, points, gt_boxes, ref_boxes, ref_labels, ref_scores,
                 point_colors, draw_origin):
    vis = o3d.visualization.Visualizer()
    vis.create_window()
    vis.get_render_option().point_size = 1.0
    vis.get_render_option().background_color = np.zeros(3)
    if draw_origin:
        vis.add_geometry(
            o3d.geometry.TriangleMesh.create_coordinate_frame(
                size=1.0, origin=[0, 0, 0]
            )
        )
    pts = o3d.geometry.PointCloud()
    pts.points = o3d.utility.Vector3dVector(points[:, :3])
    if point_colors is None:
        pts.colors = o3d.utility.Vector3dVector(
            np.ones((len(points), 3)) * 0.9
        )
    else:
        pts.colors = o3d.utility.Vector3dVector(point_colors)
    vis.add_geometry(pts)

    def add_boxes(boxes, color):
        for box in boxes:
            corners = box_to_corners(box)
            ls = o3d.geometry.LineSet(
                points=o3d.utility.Vector3dVector(corners),
                lines=o3d.utility.Vector2iVector(np.array(_BOX_EDGES)),
            )
            ls.colors = o3d.utility.Vector3dVector(
                np.tile(np.asarray(color, np.float64), (len(_BOX_EDGES), 1))
            )
            vis.add_geometry(ls)

    if gt_boxes is not None and len(gt_boxes):
        add_boxes(np.asarray(gt_boxes), (0, 0, 1))
    if ref_boxes is not None and len(ref_boxes):
        add_boxes(np.asarray(ref_boxes), (0, 1, 0))
    vis.run()
    vis.destroy_window()


def _draw_matplotlib(points, gt_boxes, ref_boxes, ref_labels, ref_scores,
                     point_colors, save_path):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 9), facecolor="black")
    ax = fig.add_subplot(111, projection="3d", facecolor="black")
    pts = np.asarray(points)
    sub = pts[:: max(1, len(pts) // 60000)]  # cap drawn points
    colors = "white" if point_colors is None else point_colors
    ax.scatter(sub[:, 0], sub[:, 1], sub[:, 2], s=0.2, c=colors,
               depthshade=False)

    def add_boxes(boxes, color, labels=None, scores=None):
        for i, box in enumerate(np.asarray(boxes)):
            corners = box_to_corners(box)
            for a, b in _BOX_EDGES:
                ax.plot(*zip(corners[a], corners[b]), color=color,
                        linewidth=0.8)
            if scores is not None:
                ax.text(*corners[4], "%.2f" % float(scores[i]),
                        color=color, fontsize=6)

    if gt_boxes is not None and len(gt_boxes):
        add_boxes(gt_boxes, "deepskyblue")
    if ref_boxes is not None and len(ref_boxes):
        add_boxes(ref_boxes, "lime", ref_labels, ref_scores)

    lim = np.percentile(np.abs(pts[:, :2]), 99) if len(pts) else 40.0
    ax.set_xlim(-5, lim)
    ax.set_ylim(-lim, lim)
    ax.set_zlim(-3, 3)
    ax.set_box_aspect((lim + 5, 2 * lim, 6))
    ax.set_axis_off()
    ax.view_init(elev=35, azim=-170)
    fig.tight_layout()
    fig.savefig(save_path, dpi=150, facecolor="black")
    plt.close(fig)
    return save_path


def draw_scenes(points, gt_boxes=None, ref_boxes=None, ref_labels=None,
                ref_scores=None, point_colors=None, draw_origin=True,
                save_path=None):
    """Show (open3d) or render (matplotlib -> ``save_path``) a lidar scene.

    Mirrors open3d_vis_utils.draw_scenes(:41-80): gt boxes blue,
    prediction boxes green with optional score tags.  Forcing the
    headless backend: pass ``save_path`` (default ``scene.png`` when
    open3d is unavailable).
    """
    points = np.asarray(points)
    o3d = None if save_path is not None else _try_open3d()
    if o3d is not None:
        _draw_open3d(o3d, points, gt_boxes, ref_boxes, ref_labels,
                     ref_scores, point_colors, draw_origin)
        return None
    return _draw_matplotlib(
        points, gt_boxes, ref_boxes, ref_labels, ref_scores, point_colors,
        save_path or "scene.png",
    )
