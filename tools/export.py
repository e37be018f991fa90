"""Export a trained detector as a self-contained serving artifact.

The reference deploys by re-running ``tools/test.py`` inside a live
PyTorch process; this CLI instead stages the full predict path (forward +
in-graph NMS post-processing) to a serialized StableHLO artifact via
``jax.export`` — weights baked in, shapes static, loadable with jax alone
(see ``pdanet_tpu/serving.py``).

Usage:
    python tools/export.py --cfg_file tools/cfgs/kitti_models/PDA-SSD.yaml \\
        --ckpt output/.../checkpoint_epoch_80.pkl \\
        --out pda_ssd_b1.stablehlo --batch_size 1 --platforms tpu,cpu

    # smoke-run the artifact (synthetic input):
    python tools/export.py --load pda_ssd_b1.stablehlo ...
"""

import argparse
from pathlib import Path

import numpy as np

import jax


def parse_args():
    parser = argparse.ArgumentParser(description="serving export")
    parser.add_argument("--cfg_file", type=str, required=True)
    parser.add_argument("--ckpt", type=str, default=None,
                        help="checkpoint .pkl; omit with --random_init for a "
                             "shape-only export")
    parser.add_argument("--random_init", action="store_true")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--out", type=str, default=None,
                        help="output path (default <cfg_stem>_b<B>.stablehlo)")
    parser.add_argument("--platforms", type=str, default=None,
                        help="comma-separated lowering targets, e.g. tpu,cpu "
                             "(default: this host's backend)")
    parser.add_argument("--load", type=str, default=None,
                        help="instead of exporting, load this artifact and "
                             "smoke-run it on a synthetic batch")
    parser.add_argument("--verify", action="store_true",
                        help="after exporting, reload the artifact and check "
                             "it reproduces the live model's outputs")
    parser.add_argument("--set", dest="set_cfgs", default=None,
                        nargs=argparse.REMAINDER, help="config overrides")
    return parser.parse_args()


def main():
    args = parse_args()

    from pdanet_tpu import serving
    from pdanet_tpu.config import cfg, cfg_from_list, cfg_from_yaml_file
    from pdanet_tpu.datasets.dataset import DatasetTemplate
    from pdanet_tpu.models import build_network

    cfg_from_yaml_file(args.cfg_file, cfg)
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)

    if args.load is not None:
        predict, exported = serving.load_serving(args.load)
        print(f"loaded {args.load}: platforms={exported.platforms}")
        print(f"  in : {[str(a) for a in exported.in_avals]}")
        print(f"  out: {[str(a) for a in exported.out_avals]}")
        # rebuild a matching synthetic batch from the config for the smoke run
        template = DatasetTemplate(
            dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
            training=False, root_path=".",
        )
        model = build_network(
            cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=template
        )
        batch = serving.example_device_batch(cfg, args.batch_size, model)
        pred = jax.block_until_ready(predict(batch))
        counts = np.asarray(pred["pred_counts"])
        print(f"smoke run OK: pred_boxes {pred['pred_boxes'].shape}, "
              f"counts per frame {counts.tolist()}")
        return

    template = DatasetTemplate(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        training=False, root_path=".",
    )
    model = build_network(
        cfg.MODEL, num_class=len(cfg.CLASS_NAMES), dataset=template
    )
    batch = serving.example_device_batch(cfg, args.batch_size, model)

    if args.ckpt is not None:
        from pdanet_tpu.train import load_checkpoint

        ck = load_checkpoint(args.ckpt)
        ms = ck["model_state"]
        variables = jax.tree.map(
            np.asarray,
            {"params": ms["params"], "batch_stats": ms["batch_stats"]},
        )
        print(f"loaded checkpoint {args.ckpt} (epoch {ck.get('epoch', '?')})")
    elif args.random_init:
        variables = jax.jit(
            lambda r, b: model.init(
                {"params": r}, b, train=False, method=model.forward_batch
            )
        )(jax.random.PRNGKey(0), batch)
        print("WARNING: exporting RANDOM weights (--random_init)")
    else:
        raise SystemExit("provide --ckpt, or --random_init for a shape-only export")

    platforms = (
        [p.strip() for p in args.platforms.split(",")] if args.platforms else None
    )
    if args.verify and platforms is not None:
        # --verify runs the artifact on THIS host; a lowering that excludes
        # the host backend (e.g. CPU host cross-lowering for TPU only) would
        # make Exported.call raise after the export.  Include the host
        # platform so verification can run; the extra lowering is harmless.
        host = jax.default_backend()
        if host not in platforms:
            print(f"--verify: adding host platform {host!r} to lowering "
                  f"targets {platforms} so the artifact can run here")
            platforms = platforms + [host]
    exported = serving.export_serving(
        model, variables, cfg.MODEL, batch, platforms=platforms
    )

    out = args.out or f"{Path(args.cfg_file).stem}_b{args.batch_size}.stablehlo"
    meta = {
        "cfg_file": args.cfg_file,
        "model": cfg.MODEL.NAME,
        "class_names": list(cfg.CLASS_NAMES),
        "batch_size": args.batch_size,
        "platforms": list(exported.platforms),
        "inputs": {
            k: {"shape": list(v.shape), "dtype": str(v.dtype)}
            for k, v in batch.items()
        },
        "outputs": [str(a) for a in exported.out_avals],
        # serve-time preprocessing contract (tools/serve.py mirrors this)
        "preprocess": {
            "sort_points": serving.test_split_sorts_points(cfg.DATA_CONFIG),
        },
        "jax_version": jax.__version__,
    }
    nbytes = serving.save_serving(exported, out, meta)
    print(f"exported {cfg.MODEL.NAME} -> {out} "
          f"({nbytes / 1e6:.1f} MB, platforms={list(exported.platforms)})")

    if args.verify:
        predict, _ = serving.load_serving(out)
        got = jax.block_until_ready(predict(batch))
        live = jax.block_until_ready(
            serving.make_predict_fn(model, variables, cfg.MODEL)(batch)
        )
        for k in live:
            np.testing.assert_allclose(
                np.asarray(got[k]), np.asarray(live[k]), rtol=1e-5, atol=1e-5,
                err_msg=k,
            )
        print("verify OK: artifact reproduces the live model's outputs")


if __name__ == "__main__":
    main()
