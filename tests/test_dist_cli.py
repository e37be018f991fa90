"""Two-OS-process distributed CLI certification (VERDICT r3 #2).

Runs the ACTUAL launcher scripts (``tools/scripts/dist_train.sh`` /
``dist_test.sh``) as 2 real OS processes with torchrun-style env-var
rendezvous (``WORLD_SIZE``/``RANK``/``MASTER_ADDR`` ->
``common_utils.init_dist_jax``) on the CPU backend (Gloo cross-process
collectives):

* **train**: one mini epoch of PDA-SSD on the 4-frame fixture — per-rank
  loader shards assembled into global batch arrays
  (``jax.make_array_from_process_local_data``), gradient all-reduce via
  GSPMD, rank-0-only checkpointing — then the post-train repeat-eval runs
  distributed (reference ``tools/train.py:191-208``).
* **eval**: ``tools/test.py`` on the produced checkpoint — pad+stride
  per-rank eval shard, per-rank prediction generation, pickle-file merge
  with order restoration (``merge_results_dist``,
  reference ``common_utils.py:201-222``) and the official KITTI eval on
  rank 0's merged result.

Matches: reference ``tools/test.py:139-163`` (init_dist + dist_test) and
``tools/scripts/dist_{train,test}.sh``.
"""

import os
import pickle
import socket
import subprocess
from pathlib import Path

import pytest

from test_cli import cli_env  # noqa: F401  (module-scoped fixture reuse)

REPO = Path(__file__).resolve().parent.parent


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_pair(script, args, workdir, env, timeout=2400):
    port = _free_port()
    procs = []
    for rank in range(2):
        e = dict(env)
        e.update(
            WORLD_SIZE="2", RANK=str(rank),
            MASTER_ADDR=f"127.0.0.1:{port}",
        )
        procs.append(subprocess.Popen(
            ["bash", str(REPO / "tools/scripts" / script)] + list(args),
            cwd=workdir, env=e, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((out, err))
    for rank, (p, (out, err)) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, (
            f"{script} rank {rank} failed (rc={p.returncode}):\n"
            f"STDOUT:{out[-800:]}\nSTDERR:{err[-2400:]}"
        )
    return outs


@pytest.mark.slow
def test_two_process_train_and_eval(cli_env, tmp_path):
    root, cfg_file, env = cli_env
    workdir = tmp_path / "dist_run"
    workdir.mkdir()

    # ---- distributed training: 1 epoch, 2 ranks -------------------------
    _run_pair(
        "dist_train.sh",
        ["--cfg_file", str(cfg_file), "--extra_tag", "dist2",
         "--workers", "0", "--num_epochs_to_eval", "1"],
        workdir, env,
    )
    ckpts = sorted((workdir / "output").rglob("checkpoint_epoch_*.pkl"))
    assert len(ckpts) == 1, f"expected exactly one rank-0 ckpt: {ckpts}"
    # the distributed post-train repeat-eval produced a merged result
    train_eval_results = list(
        (workdir / "output").rglob("eval_with_train/**/result.pkl"))
    assert train_eval_results, "post-train distributed eval wrote no result"
    with open(train_eval_results[0], "rb") as f:
        annos = pickle.load(f)
    assert len(annos) == 4, "merged post-train eval must cover all frames"

    # ---- distributed eval CLI on the checkpoint --------------------------
    _run_pair(
        "dist_test.sh",
        ["--cfg_file", str(cfg_file), "--ckpt", str(ckpts[0]),
         "--extra_tag", "dist2", "--workers", "0"],
        workdir, env,
    )
    results = [p for p in (workdir / "output").rglob("result.pkl")
               if "eval_with_train" not in str(p)]
    assert results, "dist_test.sh produced no merged result.pkl"
    with open(results[0], "rb") as f:
        det_annos = pickle.load(f)
    # merge restored dataset order across the 2 stride-shards, no dupes
    assert [a["frame_id"] for a in det_annos] == [
        "%06d" % i for i in range(4)]
    assert set(det_annos[0].keys()) >= {
        "name", "score", "boxes_lidar", "bbox", "location", "frame_id",
    }

    # ---- determinism: an identical 2-process eval reproduces bitwise ----
    # (single-process value equality is NOT a valid contract here: the
    # eval-split ``sample_points`` subsampling consumes the pinned
    # np.random stream in per-rank frame order, so a different sharding
    # draws different subsamples — the reference's DistributedSampler
    # eval has the same property across world sizes.)
    _run_pair(
        "dist_test.sh",
        ["--cfg_file", str(cfg_file), "--ckpt", str(ckpts[0]),
         "--extra_tag", "dist2b", "--workers", "0"],
        workdir, env,
    )
    again = [p for p in (workdir / "output").rglob("result.pkl")
             if "dist2b" in str(p)]
    assert again
    with open(again[0], "rb") as f:
        det_again = pickle.load(f)
    import numpy as np

    assert [a["frame_id"] for a in det_again] == [
        a["frame_id"] for a in det_annos]
    for a, b in zip(det_annos, det_again):
        np.testing.assert_array_equal(
            a["boxes_lidar"], b["boxes_lidar"], err_msg=a["frame_id"])
        np.testing.assert_array_equal(
            a["score"], b["score"], err_msg=a["frame_id"])


@pytest.mark.slow
def test_two_process_multidevice_train_eval(cli_env, tmp_path):
    """2 OS processes x 2 virtual devices each = a 4-device global mesh
    (VERDICT r4 next#7a): each rank's ``make_array_from_process_local_data``
    must assemble a MULTI-device local shard (2 frames on 2 local devices
    per process), exercising the true multi-host topology — per-process
    addressable-device subsets, GSPMD all-reduce across all 4 — instead
    of the world=2x1-device degenerate case."""
    root, cfg_file, env = cli_env
    env = dict(env)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    workdir = tmp_path / "dist_md"
    workdir.mkdir()

    # global batch = batch_size(1/device) * 4 devices = the 4-frame fixture
    _run_pair(
        "dist_train.sh",
        ["--cfg_file", str(cfg_file), "--extra_tag", "distmd",
         "--batch_size", "1", "--workers", "0",
         "--num_epochs_to_eval", "1"],
        workdir, env,
    )
    ckpts = sorted((workdir / "output").rglob("checkpoint_epoch_*.pkl"))
    assert len(ckpts) == 1, f"expected exactly one rank-0 ckpt: {ckpts}"
    train_eval_results = list(
        (workdir / "output").rglob("eval_with_train/**/result.pkl"))
    assert train_eval_results, "post-train distributed eval wrote no result"
    with open(train_eval_results[0], "rb") as f:
        annos = pickle.load(f)
    assert len(annos) == 4

    _run_pair(
        "dist_test.sh",
        ["--cfg_file", str(cfg_file), "--ckpt", str(ckpts[0]),
         "--extra_tag", "distmd", "--batch_size", "2", "--workers", "0"],
        workdir, env,
    )
    results = [p for p in (workdir / "output").rglob("result.pkl")
               if "eval_with_train" not in str(p)]
    assert results, "dist_test.sh produced no merged result.pkl"
    with open(results[0], "rb") as f:
        det_annos = pickle.load(f)
    assert [a["frame_id"] for a in det_annos] == [
        "%06d" % i for i in range(4)]
