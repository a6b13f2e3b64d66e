"""Whole-step speed-of-light: the bandwidth-floor arithmetic for the train
step (VERDICT r4 Next #1 "or publish the floor math").

Sums HBM traffic over every top-level instruction of the ENTRY computation
of the optimized train-step HLO (the artifact `analyze_trace.py` leaves in
MGA_HLO_DUMP). Memory-space aware — the v5e HLO is full of ``S(1)``
(VMEM-resident) and ``S(2)`` (SMEM) buffers and async slice/copy pairs:

  * a shape token annotated S(1)/S(2) costs no HBM traffic;
  * ``async-done`` / ``copy-done`` are completion tokens of a transfer the
    matching ``-start`` already paid for — free;
  * ``async-start`` pays only its RESULT elements (the leading inner-tuple
    ``((...))`` group aliases the operands; a DMA slice reads only the
    slice, so operands are not charged);
  * ``slice``/``dynamic-slice``/``broadcast`` charge output-side bytes only
    (they touch output-many bytes, not their whole operand);
  * every other instruction (fusion, conv, custom-call, reduce, copy, ...)
    reads its HBM operands and writes its HBM outputs once — TPU has no
    inter-instruction cache, VMEM reuse exists only inside a fusion, so
    per-use counting is the right model.

Bytes include the (sublane,lane) tile padding encoded in each layout. The

    floor_ms = total_HBM_bytes / PEAK_BW

is the time the CURRENT program needs at 100% HBM utilization: if the
1,600 img/s target (80 ms @ b128) sits below it, no scheduling win reaches
the target without changing the program (fewer/smaller intermediates); the
conv rows already near their own SoL (sol_conv.py) bound how much the
program can shrink.

Usage: python tools/scripts/sol_step.py   (after analyze_trace.py capture)
Env: MGA_HLO_DUMP, MGA_PEAK_GBS, MGA_TRACE_MODE (selects *_step HLO file),
MGA_SOL_STEP_TOP (print N biggest instruction rows).
"""

from __future__ import annotations

import collections
import glob
import os
import re

DUMP_DIR = os.environ.get("MGA_HLO_DUMP", "/tmp/mga_hlo_dump")
PEAK_BW = float(os.environ.get("MGA_PEAK_GBS", "819")) * 1e9
MODE = os.environ.get("MGA_TRACE_MODE", "train")
TOP = int(os.environ.get("MGA_SOL_STEP_TOP", "25"))

_NAME = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+")
_OPC = re.compile(r"(?:^|\s)([a-z][\w\-]*)\(")
_REF = re.compile(r"%([\w.\-]+)")
# full shape token incl. the whole layout brace (to see S(n) annotations)
_SHAPE = re.compile(r"(\w+)\[([\d,]*)\](?:\{([^}]*)\})?")
_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
                "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8}
FREE = {"parameter", "constant", "get-tuple-element", "bitcast", "tuple",
        "after-all", "partition-id", "replica-id", "iota",
        "async-done", "copy-done", "all-gather-done", "collective-permute-done"}
OUT_ONLY = {"slice", "dynamic-slice", "broadcast", "async-start", "copy-start"}


def tok_bytes(tok: tuple) -> int:
    """HBM bytes of one shape token: 0 for non-HBM spaces, tile-padded else."""
    dt, dims_s, lay = tok
    lay = lay or ""
    if "S(" in lay:  # S(1)=VMEM, S(2)=SMEM — not HBM traffic
        return 0
    bs = _DTYPE_BYTES.get(dt, 4)
    dims = [int(x) for x in dims_s.split(",") if x]
    if not dims:
        return bs
    order_s = lay.split(":")[0] if lay else ""
    order = [int(x) for x in order_s.split(",") if x.strip().isdigit()] or \
        list(range(len(dims)))[::-1]
    minor = order[0]
    sub = order[1] if len(order) > 1 else None
    sublane = 16 if dt == "bf16" else 8
    padded = list(dims)
    padded[minor] = -(-dims[minor] // 128) * 128
    if sub is not None:
        padded[sub] = -(-dims[sub] // sublane) * sublane
    n = 1
    for d in padded:
        n *= d
    return n * bs


def shape_tokens(text: str) -> list[tuple]:
    return [m.groups() for m in _SHAPE.finditer(text)]


def result_tokens_async(text: str) -> list[tuple]:
    """async-start output is ((aliased operands...), results..., token) —
    return tokens OUTSIDE the leading inner-tuple alias group."""
    t = text.strip()
    if t.startswith("(("):
        depth, i = 0, 0
        for i, ch in enumerate(t[1:], start=1):
            depth += ch == "("
            depth -= ch == ")"
            if depth < 0:  # closed the inner alias group
                break
        t = t[i + 1:]
    return shape_tokens(t)


def main() -> None:
    hlo = sorted(glob.glob(f"{DUMP_DIR}/*{MODE}_step*after_optimizations.txt")) or \
        sorted(glob.glob(f"{DUMP_DIR}/*after_optimizations.txt"))
    assert hlo, f"no HLO text in {DUMP_DIR}; run analyze_trace.py first"
    path = hlo[-1]

    out_shapes: dict[str, list[tuple]] = {}
    entry_lines: list[str] = []
    cur_entry = False
    with open(path) as f:
        for line in f:
            m = re.match(r"^(ENTRY\s+)?%?([\w.\-]+)\s+\(.*\)\s+->", line)
            if m and "=" not in line.split("->")[0]:
                cur_entry = bool(m.group(1))
                continue
            nm = _NAME.match(line)
            if not nm:
                continue
            name = nm.group(1)
            rest = line[nm.end():]
            om = _OPC.search(rest)
            shape_txt = rest[: om.start()] if om else rest
            out_shapes[name] = shape_tokens(shape_txt)
            if cur_entry:
                entry_lines.append(line)

    by_opc: dict[str, float] = collections.defaultdict(float)
    rows: list[tuple[int, str, str]] = []
    total = 0
    n_instr = 0
    for line in entry_lines:
        nm = _NAME.match(line)
        name = nm.group(1)
        rest = line[nm.end():]
        om = _OPC.search(rest)
        if not om:
            continue
        opc = om.group(1)
        if opc in FREE:
            continue
        n_instr += 1
        shape_txt = rest[: om.start()]
        if opc == "async-start":
            b = sum(tok_bytes(t) for t in result_tokens_async(shape_txt))
        else:
            b = sum(tok_bytes(t) for t in shape_tokens(shape_txt))
            if opc not in OUT_ONLY:
                seen = set()
                for ref in _REF.findall(rest[om.end():].split("metadata=")[0]):
                    if ref in out_shapes and ref != name and ref not in seen:
                        seen.add(ref)
                        b += sum(tok_bytes(t) for t in out_shapes[ref])
        by_opc[opc] += b
        total += b
        rows.append((b, name, opc))

    print(f"HLO: {path}")
    print(f"entry instructions moving HBM data: {n_instr}")
    print(f"total HBM bytes/step (tile-padded, space-aware): {total / 1e9:.2f} GB")
    print(f"bandwidth floor at {PEAK_BW / 1e9:.0f} GB/s: {total / PEAK_BW * 1e3:.1f} ms/step")
    print("\n-- bytes by opcode --")
    for opc, b in sorted(by_opc.items(), key=lambda kv: -kv[1])[:15]:
        print(f"{b / 1e9:8.2f} GB  {opc}")
    print(f"\n-- top {TOP} instructions by HBM bytes --")
    for b, name, opc in sorted(rows, key=lambda r: -r[0])[:TOP]:
        print(f"{b / 1e6:9.1f} MB  {opc:<12} {name}")


if __name__ == "__main__":
    main()
