"""Post-processing NMS helpers (model_utils/model_nms_utils.py:6-66).

``class_agnostic_nms``: score threshold -> topk(NMS_PRE_MAXSIZE) -> rotated
greedy NMS -> first NMS_POST_MAXSIZE survivors, fixed-size outputs.
"""

import jax.numpy as jnp

from ...ops.nms import nms_rotated


def class_agnostic_nms(box_scores, box_preds, nms_config, score_thresh=None):
    """Args:
        box_scores: (N,) sigmoid scores; box_preds: (N, 7).
    Returns:
        selected: (POST,) int32 indices (-1 padded), count, scores.

    NOTE: on TPU the greedy walk is a Pallas kernel that cannot run under
    vmap; for batched frames use ``detectors.iassd.post_processing`` (it
    batches the walk on the leading axis).
    """
    return nms_rotated(
        box_preds,
        box_scores,
        thresh=float(nms_config.NMS_THRESH),
        pre_maxsize=int(nms_config.NMS_PRE_MAXSIZE),
        post_maxsize=int(nms_config.NMS_POST_MAXSIZE),
        score_thresh=score_thresh,
    )
