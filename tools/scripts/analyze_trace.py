"""Attribute train-step device time to model ops: trace + HLO-dump join.

The jax.profiler trace (tools/scripts/profile_step.py) names device events
after optimized-HLO instructions (fusion.3428, convert_reduce_fusion.52 ...)
which is useless on its own. This script re-runs one train step with
``--xla_dump_to`` so the optimized module text is available, parses each
fusion's fused computation to recover the JAX-level ``op_name`` metadata of
its constituent ops, then joins that against the trace's per-instruction
durations to print a table of device time grouped by (a) model layer and
(b) op kind (conv fwd / conv dgrad / conv wgrad / BN / loss / optimizer).

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/analyze_trace.py
Env: MGA_BENCH_{IMGSZ,BATCH,PALLAS,LANEPACK} as in profile_step.py.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import shutil

TRACE_DIR = os.environ.get("MGA_TRACE_DIR", "/tmp/mga_trace2")
DUMP_DIR = os.environ.get("MGA_HLO_DUMP", "/tmp/mga_hlo_dump")
IMGSZ = int(os.environ.get("MGA_BENCH_IMGSZ", "640"))
BATCH = int(os.environ.get("MGA_BENCH_BATCH", "128"))
STEPS = 5


def capture_eval() -> None:
    """Trace the EVAL forward (bench.py's inference program: train=False,
    decoded head) — VERDICT r4 Next #6: inference has been flat ~5.3k img/s
    for three rounds with no attribution ever captured. Same trace+HLO-join
    method as the train capture; MGA_TRACE_MODE=eval selects this."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mga_yolo_tpu.models.yolo import create_model

    model, _spec = create_model(
        "configs/models/yolov8_cbam.yaml", scale="n", nc=1,
        use_pallas=os.environ.get("MGA_BENCH_PALLAS", "auto"),
        training=False,
    )
    v = model.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 256, 256, 3), jnp.bfloat16), train=False)
    v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16)
                               if a.dtype == jnp.float32 else a, v)
    x = jnp.asarray(
        np.random.default_rng(0).random((BATCH, IMGSZ, IMGSZ, 3)), jnp.bfloat16)

    @jax.jit
    def fwd(v, x):
        return model.apply(v, x, train=False)["det"][0]

    compiled = fwd.lower(v, x).compile()
    os.makedirs(DUMP_DIR, exist_ok=True)
    with open(f"{DUMP_DIR}/eval_step_after_optimizations.txt", "w") as f:
        f.write(compiled.as_text())

    for _ in range(3):
        out = fwd(v, x)
    jax.block_until_ready(out)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(STEPS):
            out = fwd(v, x)
        jax.block_until_ready(out)


def capture() -> None:
    import jax
    import jax.numpy as jnp

    from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import state as S
    from tools.scripts.bench_train import make_batch

    cfg = load_config({})
    model, spec = create_model(
        "configs/models/yolov8_cbam.yaml", scale="n", nc=1,
        use_pallas=os.environ.get("MGA_BENCH_PALLAS", "auto"),
        lane_pack=os.environ.get("MGA_BENCH_LANEPACK", "auto"),
        lane_pack_regions=os.environ.get("MGA_BENCH_REGIONS", "auto"),
        remat=os.environ.get("MGA_BENCH_REMAT", "auto"),
    )
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=256)
    mesh = S.data_mesh(jax.devices()[:1])
    data = S.host_local_to_global(make_batch(BATCH, IMGSZ), mesh)
    jax.block_until_ready(data["image"])
    rngk = jax.random.PRNGKey(1)
    step_fn = S.jit_train_step(
        S.make_train_step(
            model, (8, 16, 32), spec.nc, det_loss_config(cfg), seg_loss_config(cfg),
            weight_decay=5e-4, ema_decay=0.9999, ema_tau=2000,
            compute_dtype=jnp.bfloat16,
        ),
        mesh,
    )
    # Fetch the optimized HLO through the PJRT client: under the axon tunnel
    # compilation happens server-side, so --xla_dump_to never writes locally;
    # compiled.as_text() returns the post-optimization module text instead.
    compiled = step_fn.lower(st, data, 0.01, 0.01, 0.9, rngk).compile()
    os.makedirs(DUMP_DIR, exist_ok=True)
    with open(f"{DUMP_DIR}/train_step_after_optimizations.txt", "w") as f:
        f.write(compiled.as_text())

    s = st
    for _ in range(3):
        s, m = step_fn(s, data, 0.01, 0.01, 0.9, rngk)
    jax.block_until_ready(m["loss"])
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(STEPS):
            s, m = step_fn(s, data, 0.01, 0.01, 0.9, rngk)
        jax.block_until_ready(m["loss"])


# --- HLO parsing -----------------------------------------------------------

# "name = shape opcode(operands...". The shape may be a tuple whose layout
# annotations contain nested parens ("(bf16[128]{0:T(256)(128)(2,1)S(1)}, ...)"),
# so we can't regex the shape. Instead: capture the name, then find the opcode
# as the first whitespace-preceded lowercase token followed by "(" — shapes and
# layouts contain no "<space><lowercase-word>(" sequences (T(/S( are uppercase,
# tuple elements are comma+space separated type tokens).
_NAME = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+(.*)$")
_OPC = re.compile(r"(?:^|\s)([a-z][\w\-]*)\(")


def _parse_instr(line: str):
    """Return (name, opcode, rest_after_opcode) or None."""
    m = _NAME.match(line)
    if not m:
        return None
    name, rest = m.groups()
    om = _OPC.search(rest)
    if not om:
        return None
    return name, om.group(1), rest[om.end():]
_CALLS = re.compile(r"calls=%?([\w.\-]+)")
_METTA = re.compile(r'op_name="([^"]*)"')


def parse_hlo(path: str):
    """Return {instr_name: (opcode, dominant_op_name)} for the entry module.

    For fusions, the dominant op_name is taken from the heaviest op inside
    the fused computation (convolution > dot > reduce > first annotated).
    """
    comp_ops: dict[str, list[tuple[str, str]]] = {}  # comp -> [(opcode, op_name)]
    fusion_calls: dict[str, str] = {}
    instr_meta: dict[str, tuple[str, str]] = {}
    cur = None
    with open(path) as f:
        for line in f:
            if line.startswith(("HloModule",)):
                continue
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s+->\s+.*{", line)
            if m and "=" not in line.split("{")[0]:
                cur = m.group(1)
                comp_ops.setdefault(cur, [])
                continue
            im = _parse_instr(line)
            if im is None or cur is None:
                continue
            name, opcode, rest = im
            meta = _METTA.search(line)
            op_name = meta.group(1) if meta else ""
            comp_ops[cur].append((opcode, op_name))
            if opcode == "fusion":
                cm = _CALLS.search(line)
                if cm:
                    fusion_calls[name] = cm.group(1)
            instr_meta[name] = (opcode, op_name)

    rank = {"convolution": 4, "dot": 3, "scatter": 2, "reduce": 1, "reduce-window": 1}

    def dominant(comp: str) -> str:
        best, score = "", -1
        for opcode, op_name in comp_ops.get(comp, []):
            sc = rank.get(opcode, 0)
            if op_name and sc > score:
                best, score = op_name, sc
        return best

    out: dict[str, tuple[str, str]] = {}
    for name, (opcode, op_name) in instr_meta.items():
        if opcode == "fusion" and name in fusion_calls:
            dom = dominant(fusion_calls[name])
            out[name] = (opcode, dom or op_name)
        else:
            out[name] = (opcode, op_name)
    return out


# --- classification --------------------------------------------------------

LAYER = re.compile(r"/(l\d+_[a-zA-Z0-9]+)[/.]")


def classify(op_name: str) -> tuple[str, str]:
    """(layer, kind) from a JAX metadata op_name path."""
    layer = "other"
    m = LAYER.search(op_name)
    if m:
        layer = m.group(1)
    elif "mga_loss" in op_name or "det_loss" in op_name or "assign" in op_name:
        layer = "loss"
    elif "seg_loss" in op_name:
        layer = "loss.seg"
    elif "sgd" in op_name or "ema" in op_name or "clip" in op_name or "opt" in op_name:
        layer = "optimizer"

    if "conv_general_dilated" in op_name or "convolution" in op_name:
        # backward convs are labeled by the trailing "@bwd" suffix below
        # (JAX marks them as transpose(jvp(...)) in op_name metadata)
        kind = "conv"
    elif "dot_general" in op_name:
        kind = "dot"
    elif "batch_norm" in op_name or "/bn/" in op_name or "normalize" in op_name:
        kind = "bn"
    elif "approx_top_k" in op_name or "top_k" in op_name:
        kind = "topk"
    elif "reduce_window" in op_name or "max_pool" in op_name:
        kind = "pool"
    elif op_name == "":
        kind = "unattributed"
    else:
        kind = "elementwise/other"
    # transpose(jvp(...)) marks backward-of-forward in JAX metadata
    if "transpose(" in op_name:
        kind += "@bwd"
    return layer, kind


def main() -> None:
    mode = os.environ.get("MGA_TRACE_MODE", "train")
    if not os.environ.get("MGA_SKIP_CAPTURE"):
        shutil.rmtree(TRACE_DIR, ignore_errors=True)
        shutil.rmtree(DUMP_DIR, ignore_errors=True)
        capture_eval() if mode == "eval" else capture()

    hlo_files = sorted(glob.glob(f"{DUMP_DIR}/*{mode}_step*after_optimizations.txt"))
    if not hlo_files:
        hlo_files = sorted(glob.glob(f"{DUMP_DIR}/*after_optimizations.txt"))
    print(json.dumps({"hlo_files": hlo_files[-3:]}))
    imap: dict[str, tuple[str, str]] = {}
    overwrites = 0
    for hf in hlo_files:
        for name, val in parse_hlo(hf).items():
            prev = imap.get(name)
            if prev is not None and prev[1] != val[1]:
                overwrites += 1
            imap[name] = val
    if overwrites:
        print(
            f"WARNING: {overwrites} instruction names recur across modules with "
            "different op_names; cross-module attribution may be imprecise"
        )

    tjs = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    agg: dict[str, float] = collections.defaultdict(float)
    unmatched_us = 0.0
    for tj in tjs:
        with gzip.open(tj, "rt") as f:
            tr = json.load(f)
        # restrict to device (TensorCore) lanes so host frames don't inflate
        # the unmatched bucket
        dev_pids = set()
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pname = e.get("args", {}).get("name", "")
                if "TPU" in pname or "Device" in pname or "/device:" in pname:
                    dev_pids.add(e.get("pid"))
        for e in tr.get("traceEvents", []):
            if e.get("ph") != "X" or not e.get("dur"):
                continue
            name = e.get("name", "")
            # device-lane events carry HLO instruction names; skip host frames
            if name in imap:
                agg[name] += e["dur"]
            elif e.get("pid") in dev_pids:
                unmatched_us += e["dur"]

    by_layer: dict[str, float] = collections.defaultdict(float)
    by_kind: dict[str, float] = collections.defaultdict(float)
    rows = []
    total = 0.0
    for name, dur_us in agg.items():
        opcode, op_name = imap[name]
        layer, kind = classify(op_name)
        ms = dur_us / 1e3 / STEPS
        total += ms
        by_layer[layer] += ms
        by_kind[kind] += ms
        rows.append((ms, name, opcode, layer, kind, op_name[:160]))

    rows.sort(reverse=True)
    print(f"\n== per-step device time attributed: {total:.1f} ms over {len(rows)} instrs ==")
    print(f"== device-lane time NOT matched to HLO map: {unmatched_us / 1e3 / STEPS:.2f} ms/step ==")
    print("\n-- top 45 instructions --")
    for ms, name, opcode, layer, kind, op_name in rows[:45]:
        print(f"{ms:8.3f} ms  {name:<28} {layer:<16} {kind:<22} {op_name}")
    print("\n-- by kind --")
    for k, v in sorted(by_kind.items(), key=lambda kv: -kv[1]):
        print(f"{v:8.2f} ms  {k}")
    print("\n-- by layer (top 25) --")
    for k, v in sorted(by_layer.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{v:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
