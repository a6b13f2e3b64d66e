"""Gradient checkpointing (remat) equivalence.

``nn.remat`` is a pure FLOPs-for-bandwidth trade: it must not change the
param tree (checkpoint compatibility), the forward values, or the gradients.
Pins the wrapping in models/yolo.py build_node / models/lanepack.py
build_packed_node (static ``train`` at call position 2). Uses a miniature
graph covering every rematted block kind (Conv/C2f/C3k2/SPPF, plus the
packed variants under lane_pack) so the 1-core CPU compile stays cheap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mga_yolo_tpu.models.yolo import create_model

MINI_CFG = {
    "nc": 1,
    "scales": {"n": [0.50, 0.25, 1024]},
    "backbone": [
        [-1, 1, "Conv", [16, 3, 2]],     # 0  /2
        [-1, 1, "Conv", [32, 3, 2]],     # 1  /4
        [-1, 1, "C2f", [32, True]],      # 2
        [-1, 1, "Conv", [64, 3, 2]],     # 3  /8  P3
        [-1, 1, "C3k2", [64, False]],    # 4
        [-1, 1, "Conv", [128, 3, 2]],    # 5  /16 P4
        [-1, 1, "Conv", [256, 3, 2]],    # 6  /32 P5
        [-1, 1, "SPPF", [256, 5]],       # 7
    ],
    "head": [
        [4, 1, "MGAMaskHead", [64, 16]],       # 8  P3 mask logits
        [[4, 8], 1, "MaskCBAM", [64]],         # 9  refined P3
        [[9, 5, 7], 1, "Detect", ["nc"]],      # 10
    ],
}


def _tree_allclose(a, b, atol=1e-6):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=1e-5)


@pytest.mark.parametrize("lane_pack", [False, True])
def test_remat_matches_plain(lane_pack):
    kw = dict(scale="n", nc=1, lane_pack=lane_pack, use_pallas=False)
    plain, spec = create_model(dict(MINI_CFG), remat=False, **kw)
    remat, _ = create_model(dict(MINI_CFG), remat=True, **kw)

    rng = jax.random.PRNGKey(0)
    x = jnp.linspace(0, 255, 2 * 64 * 64 * 3, dtype=jnp.float32).reshape(2, 64, 64, 3)
    v0 = jax.jit(lambda r, a: plain.init(r, a, train=False))(rng, x)
    v1 = jax.jit(lambda r, a: remat.init(r, a, train=False))(rng, x)

    # identical param/batch_stats trees -> checkpoints interchangeable
    assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)
    _tree_allclose(v0, v1)

    def fwd_sum(model, variables):
        out = model.apply(variables, x, train=False)
        acc = sum(jnp.sum(m.astype(jnp.float32)) for m in out["det"][1])
        return acc + sum(jnp.sum(s.astype(jnp.float32)) for s in out["seg"].values())

    np.testing.assert_allclose(
        float(jax.jit(lambda v: fwd_sum(plain, v))(v0)),
        float(jax.jit(lambda v: fwd_sum(remat, v))(v0)),
        rtol=1e-5,
    )

    def loss(model, params, bs):
        variables = {"params": params, "batch_stats": bs}
        out, _ = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"gater": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(1)},
        )
        acc = sum(jnp.sum(m.astype(jnp.float32) ** 2) for m in out["det"])
        return acc + sum(jnp.sum(s.astype(jnp.float32) ** 2) for s in out["seg"].values())

    g0 = jax.jit(jax.grad(lambda p: loss(plain, p, v0["batch_stats"])))(v0["params"])
    g1 = jax.jit(jax.grad(lambda p: loss(remat, p, v1["batch_stats"])))(v0["params"])
    _tree_allclose(g0, g1, atol=1e-4)
