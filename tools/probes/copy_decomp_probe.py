"""Decompose the train step's layout-copy family (VERDICT r4 next#1a).

The r4 xplane split showed layout-relayout copies are the #1 cost family
in the KITTI b2 fused train step (19.8 of 30.4 ms/step f32) but never said
WHICH copies.  This probe joins three sources on the HLO instruction name:

  1. the optimized HLO text of the compiled step (shapes + layouts; the
     operand's defining instruction gives the source layout),
  2. the instruction metadata (``op_name=`` — the JAX source op, i.e.
     which model component produced the tensor),
  3. an xplane device trace (per-instruction device time).

and prints the top copies as
  duration | shape | src-layout -> dst-layout | producer | consumer | jax op

Usage: python tools/probes/copy_decomp_probe.py [f32|bf16] [B] [kitti|once]
       [train|fwd]
"""

import glob
import os
import re
import sys
from collections import defaultdict

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

N_STEPS = 3

_NAME_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w\.\-]+)\s*=\s*")
_TYPE_RE = re.compile(r"^([a-z0-9]+)\[([0-9,]*)\](\{[^}]*\})?")
_OPND_RE = re.compile(r"%([\w\.\-]+)")
_META_RE = re.compile(r'op_name="([^"]*)"')


def parse_hlo(text):
    """name -> dict(dtype, shape, layout, opcode, operands, op_name, line).

    Handles tuple-typed results: ``%f = (f32[..]{..}, s32[..]{..}) fusion(..)``
    (dtype/shape/layout then describe the first tuple element)."""
    instrs = {}
    for line in text.splitlines():
        m = _NAME_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        rest = line[m.end():]
        tuple_ty = rest.startswith("(")
        if tuple_ty:
            # balance parens to find the end of the tuple type
            depth, i = 0, 0
            for i, ch in enumerate(rest):
                depth += ch == "("
                depth -= ch == ")"
                if depth == 0:
                    break
            ty, rest2 = rest[1:i], rest[i + 1:].lstrip()
        else:
            tm = _TYPE_RE.match(rest)
            if not tm:
                continue
            ty, rest2 = rest[: tm.end()], rest[tm.end():].lstrip()
        tm = _TYPE_RE.match(ty.lstrip())
        if not tm:
            continue
        dtype, shape, layout = tm.groups()
        om = re.match(r"([\w\-]+)\(", rest2)
        if not om:
            continue
        opcode = om.group(1)
        paren = rest2[om.end() - 1:]
        opnds = _OPND_RE.findall(paren.split("), ")[0] if "), " in paren else paren)
        meta = _META_RE.search(line)
        instrs[name] = dict(
            dtype=dtype,
            shape=shape,
            layout=(layout or "").strip("{}"),
            opcode=opcode,
            operands=opnds,
            op_name=meta.group(1) if meta else "",
            tuple=tuple_ty,
            line=line.strip(),
        )
    return instrs


def short_op_name(op_name):
    """Keep the informative tail of a jit scope path."""
    parts = [p for p in op_name.split("/") if p and not p.startswith("jit(")]
    return "/".join(parts[-4:]) if parts else op_name


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "f32"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ds = sys.argv[3] if len(sys.argv) > 3 else "kitti"

    from bench import build_model, lidar_like_cloud
    from pdanet_tpu.train import (
        build_optimizer_and_schedule,
        create_train_state,
        make_train_step,
    )

    cfg_path = (
        "tools/cfgs/once_models/PDA-SSD.yaml" if ds == "once"
        else "tools/cfgs/kitti_models/PDA-SSD.yaml"
    )
    cfg, model = build_model(cfg_path)
    # the shipped yamls default TRAIN_COMPUTE_DTYPE: bf16 (r5) — set the
    # requested mode explicitly either way and rebuild
    from pdanet_tpu.models import build_network

    if mode == "bf16":
        cfg.MODEL.BACKBONE_3D.TRAIN_COMPUTE_DTYPE = "bf16"
    else:
        cfg.MODEL.BACKBONE_3D.pop("TRAIN_COMPUTE_DTYPE", None)
    model = build_network(cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          input_channels=4)
    if ds == "once":
        points = jnp.asarray(
            lidar_like_cloud(11, B, 60000, x_range=(0.0, 75.0)))
    else:
        points = jnp.asarray(lidar_like_cloud(13, B, 16384))
    rng = np.random.RandomState(0)
    gt = np.zeros((B, 40, 8), np.float32)
    for b in range(B):
        for m in range(12):
            gt[b, m] = [rng.uniform(5, 60), rng.uniform(-20, 20),
                        rng.uniform(-1.2, -0.4), 3.9, 1.6, 1.56,
                        rng.uniform(-np.pi, np.pi), 1.0]
    gt = jnp.asarray(gt)

    variables = jax.jit(lambda r, p: model.init({"params": r}, p, train=False))(
        jax.random.PRNGKey(0), points
    )
    phase = sys.argv[4] if len(sys.argv) > 4 else "train"
    if phase == "fwd":
        # eval forward (COMPUTE_DTYPE path incl. Pallas attention) — for
        # itemizing the forward "remainder" (VERDICT r4 next#2)
        def fwd_fn(variables, pts):
            return model.apply(
                variables, {"points": pts},
                method=lambda m, b: m.forward_batch(b, train=False))

        fwd = jax.jit(fwd_fn)
        compiled = fwd.lower(variables, points).compile()
        hlo = compiled.as_text()
        instrs = parse_hlo(hlo)
        print(f"parsed {len(instrs)} HLO instructions (fwd)")
        consumers = defaultdict(list)
        for nm, ins in instrs.items():
            for o in ins["operands"]:
                if o in instrs:
                    consumers[o].append(nm)
        out = fwd(variables, points)
        jax.block_until_ready(out)
        logdir = f"/tmp/copy_trace_{ds}_{mode}_fwd"
        os.system(f"rm -rf {logdir}")
        with jax.profiler.trace(logdir):
            for i in range(N_STEPS):
                out = fwd(variables, points + i * 1e-7)
            jax.block_until_ready(out)
    else:
        tx, _ = build_optimizer_and_schedule(cfg.OPTIMIZATION, 100, 80)
        state = create_train_state(model, variables, tx)
        step_fn = make_train_step(model, tx)
        batch = {"points": points, "gt_boxes": gt}
        lowered = jax.jit(step_fn).lower(state, batch)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        instrs = parse_hlo(hlo)
        print(f"parsed {len(instrs)} HLO instructions")

        # consumers map
        consumers = defaultdict(list)
        for nm, ins in instrs.items():
            for o in ins["operands"]:
                if o in instrs:
                    consumers[o].append(nm)

        step = jax.jit(step_fn)
        st, loss, _ = step(state, batch)
        print(f"compiled ({mode}); loss {float(loss):.3f}")
        logdir = f"/tmp/copy_trace_{ds}_{mode}"
        os.system(f"rm -rf {logdir}")
        with jax.profiler.trace(logdir):
            st = state
            for i in range(N_STEPS):
                st, loss, _ = step(
                    st, {"points": points + i * 1e-7, "gt_boxes": gt})
            jax.block_until_ready(loss)

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    assert files, f"no xplane under {logdir}"
    space = xplane_pb2.XSpace()
    with open(files[0], "rb") as f:
        space.ParseFromString(f.read())

    durs = defaultdict(float)
    for plane in space.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        emeta = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                durs[emeta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e12
        if durs:
            break

    # IMPORTANT: xplane event-metadata names are the FULL HLO instruction
    # text ("%copy.7 = f32[...] copy(... %fusion.3 ...)"), so substring
    # classification over the whole name misattributes fusions whose
    # OPERANDS are copies.  Extract the defined name and use the parsed
    # opcode.  (This is exactly the bug that inflated the r4 "copy
    # family" number — see STATUS r5.)
    def instr_name(nm):
        head = nm.split(" = ")[0].strip()
        return head.lstrip("%")

    # true family split by opcode
    fam = defaultdict(float)
    for nm, sec in durs.items():
        base = instr_name(nm)
        ins = instrs.get(base)
        opcode = ins["opcode"] if ins else "?"
        if opcode == "?":
            # fall back: opcode word after "= type" in the text
            m = re.search(r"\)\s*([\w\-]+)\(", nm) or re.search(
                r"\]\S*\s+([\w\-]+)\(", nm
            )
            opcode = m.group(1) if m else "?"
        if opcode in ("copy", "transpose", "bitcast", "bitcast-convert"):
            key = "copy/layout"
        elif opcode == "fusion":
            key = "fusion"
        elif opcode == "custom-call":
            low = base.lower()
            if "farthest" in low or "fps" in low:
                key = "fps-kernel"
            elif "ball" in low or "bq_" in low:
                key = "ball-query"
            else:
                key = "custom-call"
        elif opcode in ("convolution", "dot"):
            key = "matmul/conv"
        elif opcode == "sort":
            key = "sort"
        else:
            key = opcode
        fam[key] += sec * 1e3 / N_STEPS
    print("\n== TRUE family split (by opcode):")
    for k, v in sorted(fam.items(), key=lambda kv: -kv[1]):
        print(f"  {v:9.3f} ms/step  {k}")

    # itemize the fusion tail by the JAX op that produced each fusion's
    # root (metadata op_name) — which model component owns the time
    comp = defaultdict(float)
    unattr = 0.0
    for nm, sec in durs.items():
        base = instr_name(nm)
        ins = instrs.get(base)
        ms = sec * 1e3 / N_STEPS
        if ins is None:
            unattr += ms
            continue
        opn = ins["op_name"]
        if not opn:
            m = _META_RE.search(nm)
            opn = m.group(1) if m else ""
        comp[short_op_name(opn) if opn else f"<no-meta:{ins['opcode']}>"] += ms
    print(f"\n== by JAX op (metadata), unattributed {unattr:.3f} ms:")
    for k, v in sorted(comp.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {v:9.3f} ms/step  {k[:140]}")

    # and by coarse model scope (the transform + first two scope segments)
    scope = defaultdict(float)
    for nm, sec in durs.items():
        base = instr_name(nm)
        ins = instrs.get(base)
        ms = sec * 1e3 / N_STEPS
        opn = ins["op_name"] if ins else ""
        if not opn:
            m = _META_RE.search(nm)
            opn = m.group(1) if m else ""
        parts = [p for p in opn.split("/") if p]
        # keep "transpose(...)" grad marker + the module path head
        mod = [p for p in parts if p.startswith(("SA_modules", "point_head",
                                                 "backbone", "vote", "Local",
                                                 "transpose"))]
        key = "/".join(mod[:3]) if mod else (parts[-1] if parts else "<none>")
        scope[key] += ms
    print("\n== by model scope:")
    for k, v in sorted(scope.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {v:9.3f} ms/step  {k[:140]}")

    # join: copy-family instructions with device time
    rows = []
    copy_total = 0.0
    for nm, sec in durs.items():
        base = instr_name(nm)
        ins = instrs.get(base)
        if ins is None or ins["opcode"] not in (
            "copy", "transpose", "bitcast", "bitcast-convert"
        ):
            continue
        ms = sec * 1e3 / N_STEPS
        copy_total += ms
        src_layout, producer, prod_op = "?", "?", ""
        if ins and ins["operands"]:
            p = ins["operands"][0]
            pi = instrs.get(p)
            if pi:
                src_layout = pi["layout"]
                producer = f"{pi['opcode']}({p})"
                prod_op = short_op_name(pi["op_name"])
        cons = consumers.get(base, [])
        cons_desc = ",".join(
            f"{instrs[c]['opcode']}" for c in cons[:3] if c in instrs
        )
        rows.append(
            (
                ms,
                nm,
                f"{ins['dtype']}[{ins['shape']}]" if ins else "?",
                src_layout,
                ins["layout"] if ins else "?",
                producer,
                cons_desc,
                short_op_name(ins["op_name"]) if ins else "",
                prod_op,
            )
        )

    rows.sort(key=lambda r: -r[0])
    tot = sum(durs.values()) * 1e3 / N_STEPS
    print(f"\n== total device {tot:.2f} ms/step; copy-family {copy_total:.2f} ms/step")
    print(f"{'ms':>8}  {'shape':<22} {'src->dst layout':<34} producer | consumers | jax-op")
    for r in rows[:40]:
        ms, nm, shape, sl, dl, prod, cons, opn, popn = r
        print(f"{ms:8.3f}  {shape:<22} {sl:>15} -> {dl:<15} {prod} | {cons}")
        print(f"          name={instrs[instr_name(nm)]['line'][:180]}")
        if opn:
            print(f"          copy-op: {opn}")
        if popn:
            print(f"          prod-op: {popn}")

    # family rollup by (shape, src->dst)
    fam = defaultdict(float)
    for r in rows:
        fam[(r[2], r[3], r[4])] += r[0]
    print("\n== rollup by (shape, src->dst layout):")
    for (shape, sl, dl), ms in sorted(fam.items(), key=lambda kv: -kv[1])[:20]:
        print(f"  {ms:8.3f} ms  {shape:<22} {sl} -> {dl}")


if __name__ == "__main__":
    main()
