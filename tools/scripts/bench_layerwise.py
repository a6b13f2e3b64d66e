"""Per-LAYER fwd / fwd+bwd wall time on the chip — names the backward offenders.

The r2 step decomposition showed bwd = 3.4x fwd (healthy ~2x) but the tunnel's
jax.profiler trace is op-less, so this builds the per-op picture by ablation
(VERDICT r2 next-round #1a): every graph node is timed standalone — same input
shapes as the real b64@640 train step, bf16 params, train=True BN — fwd and
grad(sum(out)) wrt (params, inputs). XLA fuses differently in the full graph,
so treat the numbers as attribution, not absolute truth.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_layerwise.py
Env: MGA_BENCH_IMGSZ (640), MGA_BENCH_BATCH (64), MGA_BENCH_TOP (sort key rows)
"""

from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

IMGSZ = int(os.environ.get("MGA_BENCH_IMGSZ", "640"))
BATCH = int(os.environ.get("MGA_BENCH_BATCH", "64"))
K1, K2, REPS = 2, 8, 3


def _bf16(tree):
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, tree
    )


def time_chain(run_one) -> float:
    def chain(n):
        salt = jnp.asarray(0.0, jnp.bfloat16)
        for _ in range(n):
            salt = run_one(salt)
        return float(salt)

    chain(1)
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); chain(K1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); chain(K2); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)


def main() -> None:
    from mga_yolo_tpu.graph import layer_param_name
    from mga_yolo_tpu.models.yolo import MGAModel, build_node, compute_strides, create_model

    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    strides = compute_strides(spec)
    x0 = jnp.zeros((BATCH, IMGSZ, IMGSZ, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), x0, train=False)
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )

    # output shape of every node via one eval_shape walk
    probe = MGAModel(spec=spec, tap_indices=tuple(n.index for n in spec.nodes))
    taps = jax.eval_shape(lambda v, xx: probe.apply(v, xx, train=False)["taps"], variables, x0)
    out_shapes = {int(i): t for i, t in taps.items()}

    def leaf_shape(t):
        return t.shape if hasattr(t, "shape") else jax.tree_util.tree_leaves(t)[0].shape

    rng = np.random.default_rng(0)

    def rand(shape):
        return jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)

    rows = []
    for node in spec.nodes:
        if node.module in ("Upsample", "Concat"):
            continue
        name = layer_param_name(node)
        sub = {}
        if name in variables["params"]:
            sub["params"] = _bf16(
                jax.tree_util.tree_map(
                    lambda s: jnp.asarray(rng.standard_normal(s.shape) * 0.05, s.dtype),
                    variables["params"][name],
                )
            )
        if "batch_stats" in variables and name in variables.get("batch_stats", {}):
            sub["batch_stats"] = jax.tree_util.tree_map(
                lambda s: jnp.zeros(s.shape, s.dtype), variables["batch_stats"][name]
            )
        mod = build_node(node, spec, strides)
        if mod is None:
            continue
        in_shapes = [leaf_shape(out_shapes[f]) if f >= 0 else x0.shape for f in node.inputs]
        ins = [rand(s) for s in in_shapes]

        is_att = node.module in ("MaskCBAM", "MaskECA", "MaskSPADE")
        is_det = node.module == "Detect"

        def apply_fn(v, args, salt):
            a = [args[0] + salt] + list(args[1:])
            if is_att:
                out = mod.apply(v, a[0], a[1], train=True, mutable=["batch_stats"],
                                rngs={"gater": jax.random.PRNGKey(0)})[0]
            elif is_det:
                out = mod.apply(v, a, train=True, mutable=["batch_stats"])[0]
                out = out[1] if isinstance(out, tuple) else out
            else:
                out = mod.apply(v, a[0], train=True, mutable=["batch_stats"])[0]
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

        fwd = jax.jit(apply_fn)
        grad = jax.jit(jax.grad(apply_fn, argnums=(0, 1)))

        def run_fwd(salt):
            v = fwd(sub, ins, salt)
            return (v * 1e-20).astype(jnp.bfloat16)

        def run_grad(salt):
            gv, gi = grad(sub, ins, salt)
            leaf = jax.tree_util.tree_leaves((gv, gi))[0]
            return (jnp.sum(leaf.astype(jnp.float32)) * 1e-20).astype(jnp.bfloat16)

        try:
            t_f = time_chain(run_fwd)
            t_g = time_chain(run_grad)
        except Exception as e:
            print(f"[layerwise] {name}: failed {type(e).__name__}: {e}")
            continue
        rows.append({
            "index": node.index, "module": node.module,
            "in": [list(s) for s in in_shapes], "c_out": node.c_out,
            "fwd_ms": round(t_f * 1e3, 2),
            "fwd_bwd_ms": round(t_g * 1e3, 2),
            "bwd_ms": round((t_g - t_f) * 1e3, 2),
            "ratio": round(t_g / t_f, 2) if t_f > 0 else None,
        })
        print(f"[layerwise] l{node.index:<2} {node.module:<12} fwd {t_f*1e3:7.2f} ms   "
              f"fwd+bwd {t_g*1e3:7.2f} ms   bwd/fwd {(t_g - t_f)/max(t_f,1e-9):5.2f}")

    rows.sort(key=lambda r: -(r["fwd_bwd_ms"] - r["fwd_ms"]))
    print(json.dumps({"imgsz": IMGSZ, "batch": BATCH, "layers": rows}, indent=1))


if __name__ == "__main__":
    main()
