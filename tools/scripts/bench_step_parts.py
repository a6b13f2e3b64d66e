"""Decompose the train-step time on one chip: forward+loss, +backward,
full step (optimizer+EMA+BN). K-chain difference timing as in bench.py.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_step_parts.py
Env: MGA_BENCH_IMGSZ (640), MGA_BENCH_BATCH (32).
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
BATCH = int(os.environ.get("MGA_BENCH_BATCH", "32"))
K1, K2, REPS = 2, 10, 5


def main() -> None:
    from mga_yolo_tpu.config import det_loss_config, load_config, seg_loss_config
    from mga_yolo_tpu.losses import mga_loss
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import state as S
    from tools.scripts.bench_train import make_batch

    cfg = load_config({})
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1,
                               use_pallas=os.environ.get("MGA_BENCH_PALLAS", "auto"),
                               lane_pack=os.environ.get("MGA_BENCH_LANEPACK", "0"),
                               lane_pack_regions=os.environ.get("MGA_BENCH_REGIONS", "auto"))
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=256)
    mesh = S.data_mesh(jax.devices()[:1])
    dcfg, scfg = det_loss_config(cfg), seg_loss_config(cfg)
    rngk = jax.random.PRNGKey(1)
    data = S.host_local_to_global(make_batch(BATCH, IMGSZ), mesh)
    jax.block_until_ready(data["image"])

    def loss_value(params, batch_stats, batch, rng, salt):
        images = S.normalize_images(batch["image"]).astype(jnp.bfloat16) + salt
        fwd = {k: v for k, v in params.items() if k != "mtl_log_vars"}
        fwd = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, fwd
        )
        mv = {"params": fwd}
        if batch_stats:
            mv["batch_stats"] = batch_stats
        out = model.apply(mv, images, train=True, mutable=["batch_stats"],
                          rngs={"gater": rng, "dropout": rng})[0]
        lb = {"gt_labels": batch["gt_labels"], "gt_bboxes": batch["gt_boxes"],
              "mask_gt": batch["mask_gt"], "masks": batch["masks"]}
        total, _, _ = mga_loss(out, lb, (8, 16, 32), spec.nc, params["mtl_log_vars"], dcfg, scfg)
        return total

    def fwd_no_loss(params, batch_stats, batch, rng, salt):
        images = S.normalize_images(batch["image"]).astype(jnp.bfloat16) + salt
        fwd = {k: v for k, v in params.items() if k != "mtl_log_vars"}
        fwd = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, fwd
        )
        mv = {"params": fwd}
        if batch_stats:
            mv["batch_stats"] = batch_stats
        out = model.apply(mv, images, train=True, mutable=["batch_stats"],
                          rngs={"gater": rng, "dropout": rng})[0]
        acc = sum(jnp.sum(m.astype(jnp.float32)) for m in out["det"][1])
        acc = acc + sum(jnp.sum(s.astype(jnp.float32)) for s in out["seg"].values())
        return acc

    def fwd_eval_no_loss(params, batch_stats, batch, rng, salt):
        # BN in eval mode (running stats, no batch reductions): the delta vs
        # fwd_no_loss isolates BN train-mode cost (stat computation forward +
        # the two-reduction BN backward) plus gater sampling
        images = S.normalize_images(batch["image"]).astype(jnp.bfloat16) + salt
        fwd = {k: v for k, v in params.items() if k != "mtl_log_vars"}
        fwd = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a, fwd
        )
        mv = {"params": fwd}
        if batch_stats:
            mv["batch_stats"] = batch_stats
        out = model.apply(mv, images, train=False, rngs={"gater": rng, "dropout": rng})
        acc = sum(jnp.sum(m.astype(jnp.float32)) for m in out["det"][1])
        acc = acc + sum(jnp.sum(s.astype(jnp.float32)) for s in out["seg"].values())
        return acc

    model_fwd = jax.jit(fwd_no_loss)
    model_grad = jax.jit(jax.grad(fwd_no_loss))
    model_grad_eval = jax.jit(jax.grad(fwd_eval_no_loss))
    fwd_only = jax.jit(loss_value)
    grad_fn = jax.jit(jax.grad(loss_value))

    step_fn = S.jit_train_step(
        S.make_train_step(model, (8, 16, 32), spec.nc, dcfg, scfg,
                          weight_decay=5e-4, ema_decay=0.9999, ema_tau=2000,
                          compute_dtype=jnp.bfloat16),
        mesh,
    )

    def time_chain(run_one):
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

    def run_model(salt):
        v = model_fwd(st.params, st.batch_stats, data, rngk, salt)
        return (v * 1e-20).astype(jnp.bfloat16)

    def run_fwd(salt):
        v = fwd_only(st.params, st.batch_stats, data, rngk, salt)
        return (v * 1e-20).astype(jnp.bfloat16)

    def run_grad(salt):
        g = grad_fn(st.params, st.batch_stats, data, rngk, salt)
        return (jnp.sum(g["mtl_log_vars"]) * 1e-20).astype(jnp.bfloat16)

    def run_model_grad(salt):
        g = model_grad(st.params, st.batch_stats, data, rngk, salt)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return (jnp.sum(leaf) * 1e-20).astype(jnp.bfloat16)

    def run_model_grad_eval(salt):
        g = model_grad_eval(st.params, st.batch_stats, data, rngk, salt)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return (jnp.sum(leaf) * 1e-20).astype(jnp.bfloat16)

    t_m = time_chain(run_model)
    t_mg = time_chain(run_model_grad)
    t_mge = time_chain(run_model_grad_eval)
    t_f = time_chain(run_fwd)
    t_g = time_chain(run_grad)

    # full step: chain through donated state
    def full(n):
        s = jax.tree_util.tree_map(jnp.copy, st)
        for _ in range(n):
            s, m = step_fn(s, data, 0.01, 0.01, 0.9, rngk)
        return float(m["loss"])

    full(1)
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); full(K1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); full(K2); t2s.append(time.perf_counter() - t0)
    t_s = (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)

    print(json.dumps({
        "imgsz": IMGSZ, "batch": BATCH,
        "model_fwd_ms": round(t_m * 1e3, 2),
        "model_fwd_bwd_ms": round(t_mg * 1e3, 2),
        "model_fwd_bwd_evalbn_ms": round(t_mge * 1e3, 2),
        "bn_train_mode_cost_ms": round((t_mg - t_mge) * 1e3, 2),
        "loss_ms": round((t_f - t_m) * 1e3, 2),
        "fwd_loss_ms": round(t_f * 1e3, 2),
        "fwd_bwd_ms": round(t_g * 1e3, 2),
        "full_step_ms": round(t_s * 1e3, 2),
        "bwd_ms": round((t_g - t_f) * 1e3, 2),
        "opt_ema_overhead_ms": round((t_s - t_g) * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
