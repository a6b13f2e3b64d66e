"""Per-layer profile: params, FLOPs and output shape for every graph node.

TPU-native replacement for the reference's ``BaseModel._profile_one_layer``
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/nn/tasks.py`,
thop FLOPs + 10x timed forward per layer, reachable via ``profile=True``):
instead of wall-timing each torch module (meaningless through the async TPU
tunnel), each node's module is lowered separately and its FLOPs read from
XLA's HLO-level ``cost_analysis`` — exact per-layer numbers with zero device
work.  Wall-time profiling of the fused whole program is the separate
``profile: true`` jax.profiler trace in the trainer.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mga_yolo_tpu.graph import GraphSpec
from mga_yolo_tpu.models import layers as L
from mga_yolo_tpu.models.yolo import MGAModel, build_node, compute_strides


def _node_param_tree(variables: dict, name: str) -> dict:
    out = {}
    p = variables.get("params", {}).get(name)
    if p is not None:
        out["params"] = p
    bs = variables.get("batch_stats", {}).get(name)
    if bs is not None:
        out["batch_stats"] = bs
    return out


def _count_params(tree: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


def _flops_of(fn, *args) -> Optional[float]:
    try:
        analysis = jax.jit(fn).lower(*args).cost_analysis()
        f = analysis.get("flops") if analysis else None
        return float(f) if f else None
    except Exception:
        return None


def profile_layers(
    model: MGAModel, variables: dict, imgsz: int, batch: int = 1
) -> list[dict]:
    """Return one row per graph node: index, module, params, gflops, shape.

    ``variables`` must come from ``model.init`` (or a checkpoint) for the SAME
    graph; per-node params are looked up by the canonical ``l{idx}_{Module}``
    naming of :func:`mga_yolo_tpu.models.yolo.build_node`.
    """
    spec: GraphSpec = model.spec
    strides = compute_strides(spec)

    # one eval_shape walk to learn every node's output shape
    x = jax.ShapeDtypeStruct((batch, imgsz, imgsz, 3), jnp.float32)
    probe = MGAModel(spec=spec, tap_indices=tuple(n.index for n in spec.nodes))
    out_shapes: dict[int, Any] = {}

    def fwd(v, xx):
        return probe.apply(v, xx, train=False)["taps"]

    taps = jax.eval_shape(fwd, variables, x)
    for idx, t in taps.items():
        out_shapes[int(idx)] = t

    def shape_of(f: int):
        return x.shape if f < 0 else _leaf_shape(out_shapes[f])

    rows: list[dict] = []
    for node in spec.nodes:
        name = f"l{node.index}_{node.module}"
        sub = _node_param_tree(variables, name)
        n_params = _count_params(sub.get("params", {}))
        gflops: Optional[float] = None

        ins = [jax.ShapeDtypeStruct(shape_of(f), jnp.float32) for f in node.inputs]
        if node.module == "Upsample":
            gflops = 0.0
        elif node.module == "Concat":
            gflops = 0.0
        else:
            mod = build_node(node, spec, strides)
            if mod is not None:
                if node.module in ("MaskCBAM", "MaskECA", "MaskSPADE"):
                    f = _flops_of(lambda v, a, b: mod.apply(v, a, b, train=False), sub, *ins)
                elif node.module == "Detect":
                    f = _flops_of(
                        lambda v, *a: mod.apply(v, list(a), train=False), sub, *ins
                    )
                else:
                    f = _flops_of(lambda v, a: mod.apply(v, a, train=False), sub, ins[0])
                gflops = f / 1e9 if f is not None else None

        rows.append(
            {
                "index": node.index,
                "module": node.module,
                "inputs": list(node.inputs),
                "stride": strides.get(node.index),
                "params": n_params,
                "gflops": round(gflops, 4) if gflops is not None else None,
                "out_shape": list(_leaf_shape(out_shapes[node.index])),
            }
        )
    return rows


def _leaf_shape(t):
    """First array leaf's shape (Detect returns a tuple/list in eval mode)."""
    leaves = jax.tree_util.tree_leaves(t)
    return tuple(leaves[0].shape)


def format_table(rows: list[dict]) -> str:
    total_p = sum(r["params"] for r in rows)
    total_f = sum(r["gflops"] or 0.0 for r in rows)
    lines = [
        f"{'idx':>4} {'module':<12} {'stride':>6} {'params':>10} "
        f"{'GFLOPs':>9} {'%FLOPs':>7}  out_shape"
    ]
    for r in rows:
        pct = 100.0 * (r["gflops"] or 0.0) / total_f if total_f else 0.0
        gf = f"{r['gflops']:.3f}" if r["gflops"] is not None else "-"
        lines.append(
            f"{r['index']:>4} {r['module']:<12} {str(r['stride']):>6} "
            f"{r['params']:>10,} {gf:>9} {pct:>6.1f}%  {tuple(r['out_shape'])}"
        )
    lines.append(f"{'':>4} {'TOTAL':<12} {'':>6} {total_p:>10,} {total_f:>9.3f}")
    return "\n".join(lines)
