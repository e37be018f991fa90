"""Timestamp the REAL eval CLI on chip at the tracked b8 config
(VERDICT r4 next#5 / r3 #5 second half).

Builds a full-scale synthetic mini-KITTI (64 frames x ~20k raw points ->
the real 16384 sample budget), saves a random-init checkpoint in the
training format, then runs the actual ``tools/test.py`` at
``--batch_size 8 --infer_time`` TWICE (first run pays fresh XLA
compiles; the second rides the persistent compile cache — the deployed
steady state) and reports both runs' ``sec_per_example``
(eval/eval_utils.py:160; reference eval_utils.py:98) and the device
``infer time`` meter next to the bench-harness kitti_b8_e2e_ms figure.

Usage: python tools/probes/eval_cli_probe.py [num_frames]
"""

import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    num_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 64

    import jax
    import numpy as np
    from kitti_fixture import build_mini_kitti

    from pdanet_tpu.config import cfg_from_yaml_file
    from pdanet_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    from pdanet_tpu.models import build_network
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
    )
    from pdanet_tpu.train.train_utils import (
        checkpoint_state,
        save_checkpoint,
    )
    from pdanet_tpu.utils.easydict import EasyDict

    work = Path(tempfile.mkdtemp(prefix="eval_cli_"))
    root = work / "kitti"
    print(f"[fixture] {num_frames} frames under {root}")
    build_mini_kitti(root, num_frames=num_frames, n_bg=20000, n_car=400,
                     n_ped=160)

    cfg = cfg_from_yaml_file(
        str(REPO / "tools/cfgs/kitti_models/PDA-SSD.yaml"), EasyDict())
    cfg.DATA_CONFIG.DATA_PATH = str(root)
    # the synthetic fixture has no gt database; eval doesn't augment
    create_kitti_infos(cfg.DATA_CONFIG, cfg.CLASS_NAMES, root, root,
                       workers=1)

    # random-init checkpoint in the training format (timing does not
    # depend on weights; the full fixed-shape forward+NMS runs anyway)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          input_channels=4)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-30, 30, (1, 16384, 4)).astype(np.float32)
    import jax.numpy as jnp

    variables = jax.jit(
        lambda r, p: model.init({"params": r}, p, train=False)
    )(jax.random.PRNGKey(0), jnp.asarray(pts))
    tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, 100, 80)
    state = create_train_state(model, variables, tx)
    ckpt_path = save_checkpoint(
        checkpoint_state(state, epoch=1, it=100),
        str(work / "checkpoint_epoch_1"))
    print(f"[ckpt] {ckpt_path}")

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, str(REPO / "tools/test.py"),
           "--cfg_file", str(REPO / "tools/cfgs/kitti_models/PDA-SSD.yaml"),
           "--batch_size", "8", "--workers", "4", "--infer_time",
           "--ckpt", ckpt_path,
           "--set", "DATA_CONFIG.DATA_PATH", str(root)]
    for run in (1, 2):
        r = subprocess.run(cmd, cwd=work, env=env, capture_output=True,
                           text=True, timeout=3000)
        out = r.stdout + r.stderr
        if r.returncode != 0:
            print(out[-4000:])
            raise SystemExit(f"test.py failed (run {run})")
        spe = re.findall(r"sec_per_example: ([0-9.]+)", out)
        inf = re.findall(r"Average infer time: ([0-9.]+)", out)
        print(f"[run {run}] sec_per_example {spe} s/frame  "
              f"infer_time {inf} ms/batch-dispatch")
    print("EVAL_CLI_PROBE_OK")


if __name__ == "__main__":
    main()
