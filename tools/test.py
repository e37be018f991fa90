"""Test / eval CLI — counterpart of ``tools/test.py`` (reference :24-208):
single-checkpoint eval or ``--eval_all`` watcher polling the ckpt dir."""

import argparse
import datetime
import glob
import os
import re
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--extra_tag", type=str, default="default")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--launcher", choices=["none", "pytorch", "slurm", "jax"], default="none")
    parser.add_argument("--tcp_port", type=int, default=18888,
                        help="accepted for reference-script compatibility; "
                             "jax.distributed uses env-var rendezvous")
    parser.add_argument("--local_rank", type=int, default=0,
                        help="accepted for reference-script compatibility")
    parser.add_argument("--eval_tag", type=str, default="default")
    parser.add_argument("--eval_all", action="store_true", default=False)
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--save_to_file", action="store_true", default=False)
    parser.add_argument("--infer_time", action="store_true", default=False)
    parser.add_argument("--max_waiting_mins", type=int, default=30)
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from pdanet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(args.cfg_file.split("/")[1:-1])
    np.random.seed(1024)  # eval-path sampling randomness pin (reference test.py:52)
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def _load_model_variables(ckpt_path):
    from pdanet_tpu.train import load_checkpoint

    ck = load_checkpoint(ckpt_path)
    ms = ck["model_state"]
    variables = {"params": ms["params"], "batch_stats": ms["batch_stats"]}
    return jax.tree.map(np.asarray, variables), ck.get("epoch", "no_number")


def eval_single_ckpt(cfg, args, model, test_loader, eval_output_dir, logger,
                     epoch_id, ckpt_path):
    from pdanet_tpu.eval import eval_one_epoch

    variables, _ = _load_model_variables(ckpt_path)
    return eval_one_epoch(
        cfg, model, variables, test_loader, epoch_id, logger,
        result_dir=eval_output_dir, save_to_file=args.save_to_file,
        infer_time=args.infer_time, dist_test=jax.process_count() > 1,
    )


def get_no_evaluated_ckpt(ckpt_dir, ckpt_record_file, args):
    ckpt_list = sorted(glob.glob(os.path.join(ckpt_dir, "*checkpoint_epoch_*.pkl")))
    evaluated = [float(x.strip()) for x in open(ckpt_record_file, "r").readlines()]
    for cur_ckpt in ckpt_list:
        num_list = re.findall("checkpoint_epoch_(.*).pkl", cur_ckpt)
        if not num_list:
            continue
        epoch_id = num_list[-1]
        if float(epoch_id) not in evaluated and int(float(epoch_id)) >= args.start_epoch:
            return epoch_id, cur_ckpt
    return -1, None


def main():
    args, cfg = parse_config()
    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.models import build_network
    from pdanet_tpu.utils import common_utils

    if args.launcher != "none":
        # multi-process eval: per-rank loader shard (pad + stride, the
        # reference DistributedSampler semantics, datasets/__init__.py:
        # 24-44 there) + pickle-file merge in eval_one_epoch.  Reference:
        # tools/test.py:149-163.
        common_utils.init_dist_jax(args.tcp_port)

    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    output_dir.mkdir(parents=True, exist_ok=True)
    eval_output_dir = output_dir / "eval"

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU

    if not args.eval_all:
        num_list = re.findall(r"\d+", args.ckpt) if args.ckpt is not None else []
        epoch_id = num_list[-1] if num_list else "no_number"
        eval_output_dir = eval_output_dir / ("epoch_%s" % epoch_id) / cfg.DATA_CONFIG.DATA_SPLIT["test"]
    else:
        eval_output_dir = eval_output_dir / "eval_all_default"
    if args.eval_tag is not None:
        eval_output_dir = eval_output_dir / args.eval_tag
    eval_output_dir.mkdir(parents=True, exist_ok=True)

    log_file = eval_output_dir / (
        "log_eval_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    )
    logger = common_utils.create_logger(log_file, rank=jax.process_index())
    logger.info("**********************Start logging**********************")

    test_set, test_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG,
        class_names=cfg.CLASS_NAMES,
        batch_size=batch_size,
        training=False,
        logger=logger,
        workers=args.workers,
        rank=jax.process_index(),
        world=jax.process_count(),
    )
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=test_set
    )

    if not args.eval_all:
        eval_single_ckpt(
            cfg, args, model, test_loader, eval_output_dir, logger,
            epoch_id, args.ckpt,
        )
        return

    # watcher loop (reference test.py:90-136)
    ckpt_dir = args.ckpt_dir if args.ckpt_dir is not None else output_dir / "ckpt"
    ckpt_record_file = eval_output_dir / ("eval_list_%s.txt" % cfg.DATA_CONFIG.DATA_SPLIT["test"])
    with open(ckpt_record_file, "a"):
        pass
    total_time = 0
    first_eval = True
    while True:
        if jax.process_count() > 1:
            # Rank 0 ALONE decides which checkpoint (if any) to eval and
            # broadcasts the decision: a barrier alone cannot make the
            # trainer's checkpoint writes or the record file equally
            # visible on a shared FS with propagation lag, and ranks
            # globbing independently could take different branches —
            # one entering the merge barrier while another loops back
            # into the poll, a mismatched named collective that hangs.
            import numpy as _np

            from jax.experimental import multihost_utils

            if jax.process_index() == 0:
                cur_epoch_id, cur_ckpt = get_no_evaluated_ckpt(
                    str(ckpt_dir), ckpt_record_file, args
                )
            else:
                cur_epoch_id, cur_ckpt = -1, None
            payload = ("%s\x00%s" % (cur_epoch_id, cur_ckpt or "")).encode()
            buf = _np.zeros(1024, _np.uint8)
            buf[: len(payload)] = _np.frombuffer(payload, _np.uint8)
            buf = _np.asarray(multihost_utils.broadcast_one_to_all(buf))
            epoch_s, ckpt_s = (
                bytes(buf).rstrip(b"\x00").decode().split("\x00", 1)
            )
            cur_epoch_id = -1 if epoch_s == "-1" else epoch_s
            cur_ckpt = ckpt_s or None
        else:
            cur_epoch_id, cur_ckpt = get_no_evaluated_ckpt(
                str(ckpt_dir), ckpt_record_file, args
            )
        if cur_epoch_id == -1 or int(float(cur_epoch_id)) < args.start_epoch:
            wait_second = 30
            if total_time > args.max_waiting_mins * 60 and (not first_eval):
                break
            time.sleep(wait_second)
            total_time += 30
            continue
        total_time = 0
        first_eval = False
        cur_result_dir = (
            eval_output_dir.parent / ("epoch_%s" % cur_epoch_id)
            / cfg.DATA_CONFIG.DATA_SPLIT["test"]
        )
        eval_single_ckpt(
            cfg, args, model, test_loader, cur_result_dir, logger,
            cur_epoch_id, cur_ckpt,
        )
        if jax.process_index() == 0:  # rank-0-only record bookkeeping
            with open(ckpt_record_file, "a") as f:
                print("%s" % cur_epoch_id, file=f)
        logger.info("Epoch %s has been evaluated" % cur_epoch_id)


if __name__ == "__main__":
    main()
