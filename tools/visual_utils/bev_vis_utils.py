"""Debug visualization — counterpart of
``tools/visual_utils/{visualize_utils,open3d_vis_utils}.py`` (mayavi /
open3d there).  Headless matplotlib BEV rendering: points + rotated gt /
prediction boxes to a PNG."""

import numpy as np


def _box_corners_bev(boxes):
    dx2, dy2 = boxes[:, 3] / 2.0, boxes[:, 4] / 2.0
    template = np.array([[1, 1], [1, -1], [-1, -1], [-1, 1]], dtype=np.float32)
    lx = template[:, 0][None] * dx2[:, None]
    ly = template[:, 1][None] * dy2[:, None]
    c, s = np.cos(boxes[:, 6]), np.sin(boxes[:, 6])
    x = lx * c[:, None] - ly * s[:, None] + boxes[:, 0:1]
    y = lx * s[:, None] + ly * c[:, None] + boxes[:, 1:2]
    return np.stack([x, y], axis=-1)  # (N, 4, 2)


def draw_bev_scene(points, gt_boxes=None, pred_boxes=None, pred_scores=None,
                   output_path="scene_bev.png", point_range=None):
    """Render a BEV scene to PNG.

    Args:
        points: (N, 3+) xyz[...]; gt_boxes/pred_boxes: (M, 7);
        pred_scores: (M,) used for annotation; point_range: [x0,y0,x1,y1].
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 12))
    ax.scatter(points[:, 0], points[:, 1], s=0.2, c="gray", alpha=0.5)

    def draw(boxes, color, scores=None):
        corners = _box_corners_bev(np.asarray(boxes))
        for i, quad in enumerate(corners):
            loop = np.concatenate([quad, quad[:1]], axis=0)
            ax.plot(loop[:, 0], loop[:, 1], c=color, linewidth=1.0)
            if scores is not None:
                ax.text(quad[0, 0], quad[0, 1], f"{scores[i]:.2f}",
                        color=color, fontsize=6)

    if gt_boxes is not None and len(gt_boxes):
        draw(np.asarray(gt_boxes)[:, :7], "limegreen")
    if pred_boxes is not None and len(pred_boxes):
        draw(np.asarray(pred_boxes)[:, :7], "red", pred_scores)

    if point_range is not None:
        ax.set_xlim(point_range[0], point_range[2])
        ax.set_ylim(point_range[1], point_range[3])
    ax.set_aspect("equal")
    ax.set_title("BEV (green = gt, red = predictions)")
    fig.savefig(output_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return output_path
