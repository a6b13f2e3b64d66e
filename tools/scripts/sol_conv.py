"""Per-convolution speed-of-light vs measured time (VERDICT r3 "Next #1").

Consumes the artifacts `analyze_trace.py` leaves behind (optimized-HLO text
in MGA_HLO_DUMP + profiler trace in MGA_TRACE_DIR), so it runs offline on
the host: for every `convolution` instruction in the compiled train step it

  - computes FLOPs from the output shape x the contraction size
    (kernel spatials x input features / feature_group_count),
  - computes the HBM bytes actually moved, including the TPU tile padding
    ((8,128) f32 / (16,128) bf16 on the two minor dims) that inflates
    traffic for C<128 feature dims — the lane-starvation tax on the early
    YOLO layers,
  - takes t_sol = max(flops/PEAK_FLOPS, bytes/PEAK_BW) per instruction,
  - joins the profiler trace's per-instruction device time (conv ops lower
    to standalone kConvolution thunks on TPU, so trace names match; convs
    wrapped in fusions are joined through the fusion's top-level name),

and prints measured-vs-SoL efficiency per conv and per layer. This is the
arithmetic that decides whether the conv-backward bucket (43% of the step
in the round-4 per-op table, BASELINE.md) is an XLA/layout inefficiency to
attack or intrinsic MXU/HBM-bound work. The reference has no analog: torch
profiler gives kernel times but never a per-op roofline.

Usage (after `MGA_SKIP_CAPTURE= python tools/scripts/analyze_trace.py` or
with artifacts already present):
  python tools/scripts/sol_conv.py
Env: MGA_TRACE_DIR, MGA_HLO_DUMP (as analyze_trace), MGA_PEAK_TFLOPS (197
bf16 v5e), MGA_PEAK_GBS (819 v5e HBM), MGA_SOL_TOP (rows to print).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re

TRACE_DIR = os.environ.get("MGA_TRACE_DIR", "/tmp/mga_trace2")
DUMP_DIR = os.environ.get("MGA_HLO_DUMP", "/tmp/mga_hlo_dump")
PEAK_FLOPS = float(os.environ.get("MGA_PEAK_TFLOPS", "197")) * 1e12
PEAK_BW = float(os.environ.get("MGA_PEAK_GBS", "819")) * 1e9
TOP = int(os.environ.get("MGA_SOL_TOP", "40"))
STEPS = int(os.environ.get("MGA_TRACE_STEPS", "5"))

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8}
# one shape token: dtype[d0,d1,...]{layout...}
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([\d,]+)[^}]*\})?")
_WINDOW = re.compile(r"window=\{([^}]*)\}")
_DIMLBL = re.compile(r"dim_labels=(\S+?)(?:,|$|\s)")
_FGC = re.compile(r"feature_group_count=(\d+)")
_META = re.compile(r'op_name="([^"]*)"')
_CALLS = re.compile(r"calls=%?([\w.\-]+)")
_NAME = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+")


def _tile_bytes(dims: list[int], layout: list[int], dtype: str) -> int:
    """HBM footprint with TPU (sublane, lane) tile padding on the two
    minor-most dims; scalar/1-D arrays are padded to one tile row."""
    bs = _DTYPE_BYTES.get(dtype, 4)
    if not dims:
        return bs
    order = layout if layout and len(layout) == len(dims) else list(range(len(dims)))[::-1]
    # layout lists minor-to-major dim indices … HLO prints {minor,...,major}
    minor = order[0]
    sub = order[1] if len(order) > 1 else None
    sublane = 16 if dtype == "bf16" else 8
    padded = list(dims)
    padded[minor] = -(-dims[minor] // 128) * 128
    if sub is not None:
        padded[sub] = -(-dims[sub] // sublane) * sublane
    n = 1
    for d in padded:
        n *= d
    return n * bs


_OPERANDS = re.compile(r"convolution\(([^)]*)\)")
_REF = re.compile(r"%([\w.\-]+)")


def parse_convs(path: str):
    """Yield dicts for every convolution instruction in the module text,
    keyed by the top-level instruction name the trace will report (the
    conv's own name, or its enclosing fusion's caller name). Operand shapes
    are not printed inline in PJRT `as_text()` output, so they are resolved
    through a name -> output-shape map built over every instruction."""
    # pass 1: every instruction's output shape; computation membership;
    # fusion top-level -> called computation
    shape_of: dict[str, tuple] = {}
    comp_convs: dict[str, list[str]] = collections.defaultdict(list)
    comp_of_fusion: dict[str, str] = {}
    cur = None
    with open(path) as f:
        for line in f:
            m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s+->", line)
            if m and "=" not in line.split("->")[0]:
                cur = m.group(1)
                continue
            nm = _NAME.match(line)
            if not nm or cur is None:
                continue
            name = nm.group(1)
            sm = _SHAPE.search(line[nm.end():])
            if sm:
                shape_of[name] = sm.groups()
            if " fusion(" in line:
                cm = _CALLS.search(line)
                if cm:
                    comp_of_fusion[name] = cm.group(1)
            if " convolution(" in line:
                comp_convs[cur].append(line)

    # computation -> owning top-level fusion name (first caller wins)
    fusion_of_comp = {}
    for fu, comp in comp_of_fusion.items():
        fusion_of_comp.setdefault(comp, fu)

    def dims_of(s):
        return ([int(x) for x in s[1].split(",") if x],
                [int(x) for x in (s[2] or "").split(",") if x], s[0])

    for comp, lines in comp_convs.items():
        for line in lines:
            nm = _NAME.match(line)
            if not nm:
                continue
            sm = _SHAPE.search(line[nm.end():])
            om = _OPERANDS.search(line)
            if not sm or not om:
                continue
            refs = _REF.findall(om.group(1))
            if len(refs) < 2 or refs[0] not in shape_of or refs[1] not in shape_of:
                continue
            out_d, out_l, out_t = dims_of(sm.groups())
            lhs_d, lhs_l, lhs_t = dims_of(shape_of[refs[0]])
            rhs_d, rhs_l, rhs_t = dims_of(shape_of[refs[1]])
            dl = _DIMLBL.search(line)
            fgc = int(_FGC.search(line).group(1)) if _FGC.search(line) else 1
            # contraction per output element = prod(window.size) x
            # lhs-feature-dim / groups. This is correct for all three conv
            # forms XLA emits (fwd, dgrad, wgrad-with-batch-as-feature):
            # the window always spans the contracted spatial extent and the
            # lhs 'f' dim is the contracted feature (N for wgrad).
            red = 1
            exotic = False
            wm = _WINDOW.search(line)
            if wm:
                w = wm.group(1)
                # transposed (dgrad/wgrad-as-conv) forms use full padding /
                # rhs_reversal; their nominal window taps overcount MACs
                # hugely (pad taps aren't semantic work). Those are all
                # 1x1-derived matmul forms here — bytes is the binding
                # bound, so skip the FLOPs bound rather than fake one.
                pads = [int(p) for pair in re.findall(r"pad=(\d+)_(\d+)", w) for p in pair]
                exotic = bool("rhs_reversal" in w or (pads and max(pads) > 3))
                sm2 = re.search(r"size=([\dx]+)", w)
                if sm2:
                    for d in sm2.group(1).split("x"):
                        red *= int(d)
                    if max(int(d) for d in sm2.group(1).split("x")) > 13:
                        exotic = True
            if dl:
                lhs_lbl = dl.group(1).split("_")[0]
                f_pos = lhs_lbl.index("f") if "f" in lhs_lbl else -1
                if 0 <= f_pos < len(lhs_d):
                    red *= lhs_d[f_pos]
            red = max(red // fgc, 1)
            n_out = 1
            for d in out_d:
                n_out *= d
            flops = 0.0 if exotic else 2.0 * n_out * red
            bts = (_tile_bytes(out_d, out_l, out_t) + _tile_bytes(lhs_d, lhs_l, lhs_t)
                   + _tile_bytes(rhs_d, rhs_l, rhs_t))
            meta = _META.search(line)
            op_name = meta.group(1) if meta else ""
            top = nm.group(1) if comp not in fusion_of_comp else fusion_of_comp[comp]
            yield {
                "top": top, "op_name": op_name,
                "out": f"{out_t}[{','.join(map(str, out_d))}]",
                "lhs": f"{lhs_t}[{','.join(map(str, lhs_d))}]",
                "rhs": f"{rhs_t}[{','.join(map(str, rhs_d))}]",
                "flops": flops, "bytes": bts,
                "sol_ms": max(flops / PEAK_FLOPS, bts / PEAK_BW) * 1e3,
                "bound": "flops" if flops / PEAK_FLOPS >= bts / PEAK_BW else "bytes",
            }


LAYER = re.compile(r"/(l\d+_[a-zA-Z0-9]+)[/.]")


def classify_layer(op_name: str) -> str:
    m = LAYER.search(op_name)
    return m.group(1) if m else ("loss" if "loss" in op_name else "other")


def _dims0(shape_str: str) -> int:
    return int(shape_str.split("[")[1][:-1].split(",")[0])


def classify_kind(c: dict) -> str:
    """fwd / dgrad / wgrad, structurally. JAX labels both gradient convs
    transpose(jvp(conv...)); a WGRAD's output is the kernel — its leading
    dim is a kernel spatial (<= 13), while both operands lead with the batch
    — so wgrad iff the output's dim0 matches NEITHER operand's dim0 (a dgrad
    always shares batch with at least one operand, even when the other
    operand is the kernel)."""
    if "transpose(" not in c["op_name"]:
        return "fwd"
    o, l, r = _dims0(c["out"]), _dims0(c["lhs"]), _dims0(c["rhs"])
    return "wgrad" if o != l and o != r else "dgrad"


def main() -> None:
    hlo_files = sorted(glob.glob(f"{DUMP_DIR}/*after_optimizations.txt"))
    assert hlo_files, f"no HLO text in {DUMP_DIR}; run analyze_trace.py first"
    convs = []
    for hf in hlo_files:
        convs.extend(parse_convs(hf))

    # trace durations per top-level instruction
    dur: dict[str, float] = collections.defaultdict(float)
    for tj in glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True):
        with gzip.open(tj, "rt") as f:
            tr = json.load(f)
        for e in tr.get("traceEvents", []):
            if e.get("ph") == "X" and e.get("dur"):
                dur[e.get("name", "")] += e["dur"]

    # a fusion may contain >1 conv: split its measured time by SoL share
    by_top: dict[str, list[dict]] = collections.defaultdict(list)
    for c in convs:
        by_top[c["top"]].append(c)
    rows = []
    for top, cs in by_top.items():
        t_ms = dur.get(top, 0.0) / 1e3 / STEPS
        sol_sum = sum(c["sol_ms"] for c in cs) or 1.0
        for c in cs:
            meas = t_ms * c["sol_ms"] / sol_sum
            rows.append({**c, "meas_ms": meas, "kind": classify_kind(c),
                         "layer": classify_layer(c["op_name"]),
                         "eff": c["sol_ms"] / meas if meas > 0 else 0.0})

    rows.sort(key=lambda r: -r["meas_ms"])
    tot_meas = sum(r["meas_ms"] for r in rows)
    tot_sol = sum(r["sol_ms"] for r in rows)
    print(f"== {len(rows)} convs: measured {tot_meas:.1f} ms/step, "
          f"speed-of-light {tot_sol:.1f} ms/step, efficiency {tot_sol / max(tot_meas, 1e-9):.0%} ==")
    print(f"{'meas':>7} {'sol':>6} {'eff':>5} {'bound':>5} {'kind':>5} {'layer':<14} out / lhs / rhs")
    for r in rows[:TOP]:
        print(f"{r['meas_ms']:7.3f} {r['sol_ms']:6.3f} {r['eff']:5.0%} {r['bound']:>5} "
              f"{r['kind']:>5} {r['layer']:<14} {r['out']} / {r['lhs']} / {r['rhs']}")

    by_layer = collections.defaultdict(lambda: [0.0, 0.0])
    for r in rows:
        by_layer[r["layer"]][0] += r["meas_ms"]
        by_layer[r["layer"]][1] += r["sol_ms"]
    print("\n-- by layer: measured / SoL / efficiency --")
    for k, (m, s) in sorted(by_layer.items(), key=lambda kv: -kv[1][0]):
        print(f"{m:8.2f} {s:7.2f} {s / max(m, 1e-9):5.0%}  {k}")
    print(json.dumps({"total_meas_ms": round(tot_meas, 2),
                      "total_sol_ms": round(tot_sol, 2)}))


if __name__ == "__main__":
    main()
