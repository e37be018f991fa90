"""Eval driver — counterpart of ``tools/eval_utils/eval_utils.py``.

``eval_one_epoch`` (reference :22-144): batched no-grad inference with a
single jitted forward+NMS function, recall statistics, dataset-specific
prediction dicts, ``--infer_time`` latency meter (first 10% iters skipped),
result.pkl dump, and the dataset's official evaluation.
"""

import pickle
import time

import numpy as np

import jax

from ..models.detectors.iassd import post_processing
from ..ops.rotated_iou import boxes_iou3d


def statistics_info(cfg, ret_dict, metric, disp_dict):
    for cur_thresh in cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST:
        metric["recall_roi_%s" % str(cur_thresh)] += ret_dict.get(
            "roi_%s" % str(cur_thresh), 0
        )
        metric["recall_rcnn_%s" % str(cur_thresh)] += ret_dict.get(
            "rcnn_%s" % str(cur_thresh), 0
        )
    metric["gt_num"] += ret_dict.get("gt", 0)


def eval_one_epoch(
    cfg, model, variables, dataloader, epoch_id, logger, dist_test=False,
    result_dir=None, save_to_file=False, infer_time=False,
):
    result_dir.mkdir(parents=True, exist_ok=True)
    final_output_dir = result_dir / "final_result" / "data"
    if save_to_file:
        final_output_dir.mkdir(parents=True, exist_ok=True)

    metric = {"gt_num": 0}
    for cur_thresh in cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST:
        metric["recall_roi_%s" % str(cur_thresh)] = 0
        metric["recall_rcnn_%s" % str(cur_thresh)] = 0

    dataset = dataloader.dataset
    class_names = dataset.class_names
    det_annos = []

    @jax.jit
    def forward(variables, dev_batch):
        out = model.apply(
            variables, dev_batch, train=False, method=model.forward_batch
        )
        pred = post_processing(
            out["batch_cls_preds"], out["batch_box_preds"],
            cfg.MODEL.POST_PROCESSING,
        )
        return pred

    logger.info(f"*************** EPOCH {epoch_id} EVALUATION *****************")
    start_time = time.time()
    infer_time_meter = []
    num_iters = len(dataloader)

    from ..train.train_utils import select_device_batch

    for i, batch_dict in enumerate(dataloader):
        dev_batch = select_device_batch(batch_dict)
        dev_batch.pop("gt_boxes", None)
        t0 = time.time()
        pred = forward(variables, dev_batch)
        pred = jax.tree.map(np.asarray, jax.block_until_ready(pred))
        if infer_time and i > num_iters * 0.1:
            infer_time_meter.append(
                (time.time() - t0) * 1000 / batch_dict["batch_size"]
            )

        # recall stats vs gt (host-side; eval batches may carry gt)
        if "gt_boxes" in batch_dict:
            for b in range(batch_dict["batch_size"]):
                cnt = int(pred["pred_counts"][b])
                gt = batch_dict["gt_boxes"][b]
                gt_valid = gt[np.any(gt[:, 0:7] != 0, axis=-1)]
                ret = {"gt": len(gt_valid)}
                if len(gt_valid) and cnt:
                    import jax.numpy as jnp

                    iou = np.asarray(
                        boxes_iou3d(
                            jnp.asarray(pred["pred_boxes"][b][:cnt]),
                            jnp.asarray(gt_valid[:, 0:7]),
                        )
                    )
                    best = iou.max(axis=0) if iou.size else np.zeros(len(gt_valid))
                    for t in cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST:
                        ret["roi_%s" % str(t)] = int((best > t).sum())
                        ret["rcnn_%s" % str(t)] = int((best > t).sum())
                else:
                    for t in cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST:
                        ret["roi_%s" % str(t)] = 0
                        ret["rcnn_%s" % str(t)] = 0
                statistics_info(cfg, ret, metric, {})

        # fixed-size outputs -> trimmed per-frame dicts
        pred_dicts = []
        for b in range(batch_dict["batch_size"]):
            cnt = int(pred["pred_counts"][b])
            pred_dicts.append(
                {
                    "pred_boxes": pred["pred_boxes"][b][:cnt],
                    "pred_scores": pred["pred_scores"][b][:cnt],
                    "pred_labels": pred["pred_labels"][b][:cnt].astype(np.int64),
                }
            )
        annos = dataset.generate_prediction_dicts(
            batch_dict, pred_dicts, class_names,
            output_path=final_output_dir if save_to_file else None,
        )
        det_annos += annos

    sec_per_example = (time.time() - start_time) / max(len(det_annos), 1)
    logger.info(
        "Generate label finished(sec_per_example: %.4f second)." % sec_per_example
    )
    if infer_time and infer_time_meter:
        logger.info("Average infer time: %.2f ms" % np.mean(infer_time_meter))

    gt_num_cnt = max(metric["gt_num"], 1)
    ret_dict = {}
    for cur_thresh in cfg.MODEL.POST_PROCESSING.RECALL_THRESH_LIST:
        cur_rcnn_recall = metric["recall_rcnn_%s" % str(cur_thresh)] / gt_num_cnt
        logger.info("recall_rcnn_%s: %f" % (cur_thresh, cur_rcnn_recall))
        ret_dict["recall/rcnn_%s" % str(cur_thresh)] = cur_rcnn_recall

    with open(result_dir / "result.pkl", "wb") as f:
        pickle.dump(det_annos, f)

    result_str, result_dict = dataset.evaluation(det_annos, class_names)
    if result_str:
        logger.info(result_str)
    ret_dict.update(result_dict)
    logger.info("Result is saved to %s" % result_dir)
    logger.info("****************Evaluation done.*****************")
    return ret_dict
