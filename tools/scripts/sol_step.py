"""Whole-step speed-of-light: the bandwidth-floor arithmetic for the train
step (VERDICT r4 Next #1 "or publish the floor math").

Sums HBM traffic over every top-level instruction of the ENTRY computation
of the optimized train-step HLO (the artifact `analyze_trace.py` leaves in
MGA_HLO_DUMP): each non-fused instruction / fusion reads its operands from
HBM and writes its outputs — TPU has no inter-instruction cache, VMEM reuse
exists only *inside* a fusion, so per-use operand counting is the right
model. Bytes include the (sublane,128-lane) tile padding. The resulting

    floor_ms = total_bytes / PEAK_BW   (vs   flop_ms = conv+dot FLOPs / peak)

is the time the CURRENT program needs at 100% HBM utilization — if the
1,600 img/s target (80 ms @ b128) sits below it, no scheduling win reaches
the target without changing the program (fewer/smaller intermediates), and
the conv rows already near their own SoL bound how much the program can
shrink.

Zero-cost opcodes: parameter/constant/get-tuple-element/bitcast/tuple (no
data movement); everything else moves its operands + outputs once.

Usage: python tools/scripts/sol_step.py   (after analyze_trace.py capture)
Env: MGA_HLO_DUMP, MGA_PEAK_GBS, MGA_TRACE_MODE (selects *_step HLO file).
"""

from __future__ import annotations

import collections
import glob
import os
import re

from sol_conv import _SHAPE, _tile_bytes  # same shape/tile arithmetic

DUMP_DIR = os.environ.get("MGA_HLO_DUMP", "/tmp/mga_hlo_dump")
PEAK_BW = float(os.environ.get("MGA_PEAK_GBS", "819")) * 1e9
MODE = os.environ.get("MGA_TRACE_MODE", "train")

_NAME = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+")
_OPC = re.compile(r"(?:^|\s)([a-z][\w\-]*)\(")
_REF = re.compile(r"%([\w.\-]+)")
FREE = {"parameter", "constant", "get-tuple-element", "bitcast", "tuple",
        "after-all", "partition-id", "replica-id", "iota"}


def shapes_in(text: str) -> list[tuple]:
    """All shape tokens (dtype, dims, layout) in a type string — handles
    tuples by listing every element."""
    return [m.groups() for m in _SHAPE.finditer(text)]


def tok_bytes(tok: tuple) -> int:
    dt, dims, lay = tok
    d = [int(x) for x in dims.split(",") if x]
    l = [int(x) for x in (lay or "").split(",") if x]
    return _tile_bytes(d, l, dt)


def main() -> None:
    hlo = sorted(glob.glob(f"{DUMP_DIR}/*{MODE}_step*after_optimizations.txt")) or \
        sorted(glob.glob(f"{DUMP_DIR}/*after_optimizations.txt"))
    assert hlo, f"no HLO text in {DUMP_DIR}; run analyze_trace.py first"
    path = hlo[-1]

    # output shape of every instruction (for operand resolution), then walk
    # the ENTRY computation's top-level instructions
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
            out_shapes[name] = shapes_in(shape_txt)
            if cur_entry:
                entry_lines.append(line)

    by_opc: dict[str, float] = collections.defaultdict(float)
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
        b = sum(tok_bytes(t) for t in out_shapes.get(name, []))
        # operands: refs inside the call parens that resolve to instructions
        args = rest[om.end():].split(", ")[0:]  # refs appear before attrs
        seen = set()
        for ref in _REF.findall(rest[om.end():].split("metadata=")[0]):
            if ref in out_shapes and ref != name and ref not in seen:
                seen.add(ref)
                b += sum(tok_bytes(t) for t in out_shapes[ref])
        by_opc[opc] += b
        total += b

    print(f"HLO: {path}")
    print(f"entry instructions moving data: {n_instr}")
    print(f"total HBM bytes/step (tile-padded): {total / 1e9:.2f} GB")
    print(f"bandwidth floor at {PEAK_BW / 1e9:.0f} GB/s: {total / PEAK_BW * 1e3:.1f} ms/step")
    print("\n-- bytes by opcode --")
    for opc, b in sorted(by_opc.items(), key=lambda kv: -kv[1])[:20]:
        print(f"{b / 1e9:8.2f} GB  {opc}")


if __name__ == "__main__":
    main()
