"""Train CLI — counterpart of ``tools/train.py`` (reference :24-213).

Same flags and output-directory scheme
(``output/<exp_group>/<tag>/<extra_tag>/ckpt``); the NCCL launcher becomes
a JAX data mesh (single process drives all local TPU chips; multi-host via
``jax.distributed.initialize`` when WORLD_SIZE is set).
"""

import argparse
import datetime
import os
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import numpy as np


def parse_config():
    parser = argparse.ArgumentParser(description="arg parser")
    parser.add_argument("--cfg_file", type=str, default=None, help="specify the config for training")
    parser.add_argument("--batch_size", type=int, default=None, required=False, help="batch size for training")
    parser.add_argument("--epochs", type=int, default=None, required=False, help="number of epochs to train for")
    parser.add_argument("--workers", type=int, default=4, help="number of workers for dataloader")
    parser.add_argument("--extra_tag", type=str, default="default", help="extra tag for this experiment")
    parser.add_argument("--ckpt", type=str, default=None, help="checkpoint to start from")
    parser.add_argument("--pretrained_model", type=str, default=None, help="pretrained_model")
    parser.add_argument("--launcher", choices=["none", "pytorch", "slurm", "jax"], default="none")
    parser.add_argument("--tcp_port", type=int, default=18888,
                        help="accepted for reference-script compatibility; "
                             "jax.distributed uses env-var rendezvous")
    parser.add_argument("--local_rank", type=int, default=0,
                        help="accepted for reference-script compatibility")
    parser.add_argument("--sync_bn", action="store_true", default=False,
                        help="accepted for compatibility: BatchNorm under the "
                             "GSPMD data mesh already reduces over the GLOBAL "
                             "batch (XLA inserts the cross-device mean), so "
                             "sync-BN semantics are always on")
    parser.add_argument("--fix_random_seed", action="store_true", default=False)
    parser.add_argument("--ckpt_save_interval", type=int, default=1)
    parser.add_argument("--max_ckpt_save_num", type=int, default=8)
    parser.add_argument("--set", dest="set_cfgs", default=None, nargs=argparse.REMAINDER,
                        help="set extra config keys if needed")
    parser.add_argument("--num_epochs_to_eval", type=int, default=5)
    parser.add_argument("--max_waiting_mins", type=int, default=0,
                        help="accepted for reference-script compatibility "
                             "(post-train eval reads finished checkpoints)")
    parser.add_argument("--start_epoch", type=int, default=0)
    parser.add_argument("--save_to_file", action="store_true", default=False)
    parser.add_argument("--merge_all_iters_to_one_epoch", action="store_true",
                        default=False)
    parser.add_argument("--profile", action="store_true", default=False,
                        help="capture a jax.profiler trace of a few train steps")

    args = parser.parse_args()
    from pdanet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file

    cfg_from_yaml_file(args.cfg_file, cfg)
    cfg.TAG = Path(args.cfg_file).stem
    cfg.EXP_GROUP_PATH = "/".join(args.cfg_file.split("/")[1:-1])
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    from pdanet_tpu.config import log_config_to_file
    from pdanet_tpu.datasets import build_dataloader
    from pdanet_tpu.models import build_network
    from pdanet_tpu.parallel import make_data_mesh
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
        load_checkpoint,
        restore_train_state,
        train_model,
    )
    from pdanet_tpu.utils import common_utils

    if args.launcher != "none":
        common_utils.init_dist_jax(args.tcp_port)

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    output_dir = Path("output") / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / "ckpt"
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    log_file = output_dir / (
        "log_train_%s.txt" % datetime.datetime.now().strftime("%Y%m%d-%H%M%S")
    )
    logger = common_utils.create_logger(log_file, rank=jax.process_index())
    logger.info("**********************Start logging**********************")
    log_config_to_file(cfg, logger=logger)

    n_dev = jax.local_device_count()
    global_batch = batch_size * n_dev
    logger.info(f"devices: {n_dev}, per-device batch {batch_size}, global {global_batch}")

    train_set, train_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG,
        class_names=cfg.CLASS_NAMES,
        batch_size=global_batch,
        training=True,
        logger=logger,
        rank=jax.process_index(),
        world=jax.process_count(),
        merge_all_iters_to_one_epoch=args.merge_all_iters_to_one_epoch,
        total_epochs=epochs,
    )

    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=train_set
    )
    if len(train_loader) == 0:
        raise RuntimeError(
            f"dataset ({len(train_set)} frames) smaller than the global batch "
            f"({global_batch}); reduce --batch_size or device count"
        )
    from pdanet_tpu.train.train_utils import select_device_batch

    rng = jax.random.PRNGKey(0)
    example_batch = next(iter(train_loader))
    example = select_device_batch(example_batch)
    variables = jax.jit(
        lambda r, b: model.init(
            {"params": r}, b, train=False, method=model.forward_batch
        )
    )(rng, example)

    iters_each_epoch = len(train_loader)
    tx, lr_fn = build_optimizer_and_schedule(
        cfg.OPTIMIZATION, iters_each_epoch, epochs
    )
    state = create_train_state(model, variables, tx)

    start_epoch = 0
    if args.ckpt is not None:
        ck = load_checkpoint(args.ckpt)
        state = restore_train_state(ck, state, tx)
        start_epoch = ck["epoch"]
        logger.info(f"resumed from {args.ckpt} at epoch {start_epoch}")
    else:
        # auto-resume from newest checkpoint (reference train.py:140-150)
        import glob

        from pdanet_tpu.train.train_utils import load_newest_checkpoint

        ckpts = sorted(
            glob.glob(str(ckpt_dir / "checkpoint_epoch_*.pkl")), key=os.path.getmtime
        )
        ck, ck_path = load_newest_checkpoint(ckpts, logger=logger)
        if ck is not None:
            state = restore_train_state(ck, state, tx)
            start_epoch = ck["epoch"]
            logger.info(f"auto-resumed from {ck_path} at epoch {start_epoch}")
    if args.pretrained_model is not None:
        ck = load_checkpoint(args.pretrained_model)
        state = restore_train_state(ck, state, tx, with_optimizer=False)
        logger.info(f"loaded pretrained model {args.pretrained_model}")

    from pdanet_tpu.utils.metrics import MetricsLogger

    tb_log = MetricsLogger(output_dir / "tensorboard") if jax.process_index() == 0 else None

    if args.profile:
        jax.profiler.start_trace(str(output_dir / "profile"))

    logger.info("**********************Start training**********************")
    mesh = make_data_mesh()
    train_model(
        model, state, tx, train_loader,
        model_cfg=cfg.MODEL,
        optim_cfg=cfg.OPTIMIZATION,
        num_class=len(cfg.CLASS_NAMES),
        start_epoch=start_epoch,
        total_epochs=epochs,
        ckpt_save_dir=ckpt_dir,
        lr_fn=lr_fn,
        ckpt_save_interval=args.ckpt_save_interval,
        max_ckpt_save_num=args.max_ckpt_save_num,
        logger=logger,
        mesh=mesh,
        tb_log=tb_log,
    )
    if args.profile:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s" % (output_dir / "profile"))
    logger.info("**********************End training**********************")

    # post-train repeat-eval of the last num_epochs_to_eval checkpoints
    # (reference train.py:191-208)
    if args.num_epochs_to_eval > 0:
        import glob
        import re

        from pdanet_tpu.eval import eval_one_epoch
        from pdanet_tpu.train import load_checkpoint

        logger.info("**********************Start evaluation**********************")
        if jax.process_count() > 1:
            # rank 0 writes the final checkpoint; everyone must see it
            # before globbing the ckpt dir (else non-zero ranks skip the
            # eval and rank 0 hangs in the merge barrier)
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("post_train_eval")
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
        eval_model = build_network(
            cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=test_set
        )
        eval_output_dir = output_dir / "eval" / "eval_with_train"
        eval_output_dir.mkdir(parents=True, exist_ok=True)
        # reference train.py:204 overrides args.start_epoch the same way
        start_eval_epoch = max(epochs - args.num_epochs_to_eval,
                               args.start_epoch, 0)
        for ck_path in sorted(glob.glob(str(ckpt_dir / "checkpoint_epoch_*.pkl"))):
            m = re.findall(r"checkpoint_epoch_(\d+)\.pkl", ck_path)
            if not m or int(m[-1]) <= start_eval_epoch:
                continue
            epoch_id = m[-1]
            ck = load_checkpoint(ck_path)
            ms = ck["model_state"]
            variables = jax.tree.map(
                np.asarray,
                {"params": ms["params"], "batch_stats": ms["batch_stats"]},
            )
            cur_result_dir = (
                eval_output_dir / ("epoch_%s" % epoch_id)
                / cfg.DATA_CONFIG.DATA_SPLIT["test"]
            )
            eval_one_epoch(
                cfg, eval_model, variables, test_loader, epoch_id, logger,
                result_dir=cur_result_dir, save_to_file=args.save_to_file,
                dist_test=jax.process_count() > 1,
            )
            logger.info("Epoch %s has been evaluated" % epoch_id)
        logger.info("**********************End evaluation**********************")


if __name__ == "__main__":
    main()
