"""A/B the per-leaf optimizer+EMA update against a flat-buffer formulation.

The measured opt+EMA overhead inside the train step is ~12 ms @ b128
(bench_step_parts.py) for ~36 MB of param-sized traffic — ~100x the HBM
speed-of-light — because clip + SGD + EMA lower to hundreds of tiny
per-tensor HLOs with fixed per-op cost on TPU. The flat variant concatenates
grads once, does the update math on single (N,) vectors (momentum + EMA
buffers stored flat), and slices the new params back for the next forward.

PYTHONPATH=/root/repo:/root/.axon_site python tools/scripts/bench_opt_fuse.py
"""

from __future__ import annotations

import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

K1, K2, REPS = 2, 22, 5


def timed(step, state0):
    def chain(n):
        s = jax.tree_util.tree_map(jnp.copy, state0)
        for _ in range(n):
            s = step(s)
        return float(jax.tree_util.tree_leaves(s)[0].reshape(-1)[0])

    chain(1)
    t1s, t2s = [], []
    for _ in range(REPS):
        t0 = time.perf_counter(); chain(K1); t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); chain(K2); t2s.append(time.perf_counter() - t0)
    return (float(np.median(t2s)) - float(np.median(t1s))) / (K2 - K1)


def main() -> None:
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train import optim, state as S

    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    st = S.create_train_state(model, jax.random.PRNGKey(0), imgsz=256)
    params = st.params
    leaves, treedef = jax.tree_util.tree_flatten(params)
    n_leaves = len(leaves)
    total = sum(int(np.prod(l.shape)) for l in leaves)
    grads = jax.tree_util.tree_map(lambda p: jnp.full_like(p, 1e-4), params)
    groups = optim.param_groups(params)
    update_fn = optim.make_update_fn("sgd", 5e-4, True)

    # ----- current per-leaf path: clip + sgd + ema ------------------------
    def step_tree(state):
        p, m, e = state
        g = optim.clip_by_global_norm(grads, 10.0)
        new_p, new_opt = update_fn(p, g, {"m": m}, groups, 0.01, 0.01, 0.937,
                                   jnp.asarray(1, jnp.int32))
        new_e = optim.ema_update(e, new_p, jnp.asarray(1, jnp.int32), 0.9999, 2000.0)
        return new_p, new_opt["m"], new_e

    tree_state = (params,
                  jax.tree_util.tree_map(jnp.zeros_like, params),
                  jax.tree_util.tree_map(jnp.copy, params))
    t_tree = timed(jax.jit(step_tree, donate_argnums=0), tree_state)

    # ----- flat path ------------------------------------------------------
    sizes = [int(np.prod(l.shape)) for l in leaves]
    offsets = np.cumsum([0] + sizes)
    tag_leaves = jax.tree_util.tree_leaves(groups)
    flat_tags = jnp.concatenate([
        jnp.full((s,), t, jnp.int32) for s, t in zip(sizes, tag_leaves)
    ])

    def flatten(tree):
        return jnp.concatenate([x.reshape(-1) for x in jax.tree_util.tree_leaves(tree)])

    def unflatten(flat):
        outs = [jax.lax.dynamic_slice_in_dim(flat, int(offsets[i]), sizes[i]).reshape(leaves[i].shape)
                for i in range(n_leaves)]
        return jax.tree_util.tree_unflatten(treedef, outs)

    def step_flat(state):
        p_tree, m_flat, e_flat = state
        g = flatten(grads)
        # clip
        norm = jnp.sqrt(jnp.sum(jnp.square(g)))
        g = g * jnp.minimum(1.0, 10.0 / (norm + 1e-6))
        p = flatten(p_tree)
        g = g + jnp.where(flat_tags == 0, 5e-4, 0.0) * p
        m_flat = 0.937 * m_flat + g
        d = g + 0.937 * m_flat
        lr = jnp.where(flat_tags == 2, 0.01, 0.01)
        new_p = p - lr * d
        decay = 0.9999 * (1.0 - jnp.exp(-1.0 / 2000.0))
        e_flat = e_flat + (1.0 - decay) * (new_p - e_flat)
        return unflatten(new_p), m_flat, e_flat

    flat_state = (params, jnp.zeros((total,), jnp.float32), flatten(params))
    t_flat = timed(jax.jit(step_flat, donate_argnums=0), flat_state)

    print(json.dumps({
        "n_leaves": n_leaves, "n_params": total,
        "tree_ms": round(t_tree * 1e3, 3),
        "flat_ms": round(t_flat * 1e3, 3),
        "speedup": round(t_tree / t_flat, 2),
    }))


if __name__ == "__main__":
    main()
