"""Optimizer factory: auto rule + one-step parity vs torch optimizers.

Parity target: reference build_optimizer
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/engine/trainer.py:885-946`)
constructs torch SGD/Adam/AdamW/RMSProp with three param groups (biases,
norm weights, decayed kernels). Here each update rule is checked against the
actual torch optimizer for one step on a tiny param tree.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mga_yolo_tpu.train import optim

torch = pytest.importorskip("torch")


def _tree():
    rng = np.random.default_rng(0)
    params = {
        "dense": {
            "kernel": rng.normal(size=(4, 3)).astype(np.float32),
            "bias": rng.normal(size=(3,)).astype(np.float32),
        },
        "norm": {"scale": rng.normal(size=(3,)).astype(np.float32)},
    }
    grads = {
        "dense": {
            "kernel": rng.normal(size=(4, 3)).astype(np.float32),
            "bias": rng.normal(size=(3,)).astype(np.float32),
        },
        "norm": {"scale": rng.normal(size=(3,)).astype(np.float32)},
    }
    return params, grads


def _torch_step(params, grads, make_opt, lr, lr_bias):
    tp = {
        k: {n: torch.nn.Parameter(torch.tensor(v)) for n, v in sub.items()}
        for k, sub in params.items()
    }
    opt = make_opt(
        [
            {"params": [tp["dense"]["bias"]], "lr": lr_bias, "weight_decay": 0.0},
            {"params": [tp["dense"]["kernel"]], "lr": lr},  # decayed group
            {"params": [tp["norm"]["scale"]], "lr": lr, "weight_decay": 0.0},
        ]
    )
    for k, sub in tp.items():
        for n, p in sub.items():
            p.grad = torch.tensor(grads[k][n])
    opt.step()
    return {k: {n: p.detach().numpy() for n, p in sub.items()} for k, sub in tp.items()}


def _jax_step(opt_name, params, grads, wd, lr, lr_bias, momentum, nesterov=True, steps=1):
    jp = {k: {n: jnp.asarray(v) for n, v in sub.items()} for k, sub in params.items()}
    groups = optim.param_groups(jp)
    st = optim.init_opt_state(opt_name, jp)
    fn = optim.make_update_fn(opt_name, wd, nesterov=nesterov)
    for t in range(1, steps + 1):
        jp, st = fn(jp, {k: {n: jnp.asarray(v) for n, v in sub.items()} for k, sub in grads.items()},
                    st, groups, lr, lr_bias, momentum, jnp.asarray(t, jnp.int32))
    return {k: {n: np.asarray(v) for n, v in sub.items()} for k, sub in jp.items()}


def _assert_tree_close(a, b, atol=1e-6):
    for k in a:
        for n in a[k]:
            np.testing.assert_allclose(a[k][n], b[k][n], atol=atol, err_msg=f"{k}/{n}")


WD, LR, LRB, MOM = 5e-4, 0.01, 0.004, 0.9


def test_sgd_nesterov_matches_torch():
    params, grads = _tree()
    want = _torch_step(
        params, grads,
        lambda g: torch.optim.SGD(g, lr=LR, momentum=MOM, nesterov=True, weight_decay=WD),
        LR, LRB,
    )
    got = _jax_step("sgd", params, grads, WD, LR, LRB, MOM)
    _assert_tree_close(got, want)


def test_adamw_matches_torch():
    params, grads = _tree()
    want = _torch_step(
        params, grads,
        lambda g: torch.optim.AdamW(g, lr=LR, betas=(MOM, 0.999), weight_decay=WD),
        LR, LRB,
    )
    got = _jax_step("adamw", params, grads, WD, LR, LRB, MOM)
    _assert_tree_close(got, want)


def test_adam_matches_torch_two_steps():
    params, grads = _tree()
    tp = {
        k: {n: torch.nn.Parameter(torch.tensor(v)) for n, v in sub.items()}
        for k, sub in params.items()
    }
    opt = torch.optim.Adam(
        [
            {"params": [tp["dense"]["bias"]], "lr": LRB, "weight_decay": 0.0},
            {"params": [tp["dense"]["kernel"]], "lr": LR, "weight_decay": WD},
            {"params": [tp["norm"]["scale"]], "lr": LR, "weight_decay": 0.0},
        ],
        betas=(MOM, 0.999),
    )
    for _ in range(2):
        for k, sub in tp.items():
            for n, p in sub.items():
                p.grad = torch.tensor(grads[k][n])
        opt.step()
    want = {k: {n: p.detach().numpy() for n, p in sub.items()} for k, sub in tp.items()}
    got = _jax_step("adam", params, grads, WD, LR, LRB, MOM, steps=2)
    _assert_tree_close(got, want)


def test_rmsprop_matches_torch():
    params, grads = _tree()
    want = _torch_step(
        params, grads,
        lambda g: torch.optim.RMSprop(g, lr=LR, momentum=MOM, alpha=0.99, eps=1e-8, weight_decay=WD),
        LR, LRB,
    )
    got = _jax_step("rmsprop", params, grads, WD, LR, LRB, MOM)
    _assert_tree_close(got, want)


def test_auto_rule():
    # > 10k iterations -> SGD(0.01, 0.9); else AdamW(lr_fit); both zero warmup_bias_lr
    big = optim.resolve_optimizer("auto", nc=1, iterations=20000, lr0=0.5, momentum=0.5, warmup_bias_lr=0.1)
    assert (big.name, big.lr0, big.momentum, big.warmup_bias_lr) == ("sgd", 0.01, 0.9, 0.0)
    small = optim.resolve_optimizer("auto", nc=1, iterations=100, lr0=0.5, momentum=0.5, warmup_bias_lr=0.1)
    assert small.name == "adamw" and small.warmup_bias_lr == 0.0
    assert small.lr0 == round(0.002 * 5 / (4 + 1), 6)
    # explicit names pass through; aliases canonicalize; unknown rejected
    assert optim.resolve_optimizer("AdamW", 1, 1, 0.01, 0.9, 0.1).name == "adamw"
    assert optim.resolve_optimizer("NAdam", 1, 1, 0.01, 0.9, 0.1).name == "adam"
    with pytest.raises(ValueError):
        optim.resolve_optimizer("lion", 1, 1, 0.01, 0.9, 0.1)


# ----------------------------------------------------------- flat-buffer path
#
# The train step stores momentum/EMA flat and updates via make_flat_update_fn
# (train/optim.py "flat buffers": one kernel per op instead of one per tensor,
# 3.5x measured). The math must be element-for-element identical to the
# per-leaf path that is torch-parity-tested above.

import jax


def _flat_steps(opt_name, params, grads, wd, lr, lr_bias, momentum, steps=3):
    jp = {k: {n: jnp.asarray(v) for n, v in sub.items()} for k, sub in params.items()}
    jg = {k: {n: jnp.asarray(v) for n, v in sub.items()} for k, sub in grads.items()}
    meta = optim.FlatMeta(jp)
    tags = optim.flat_group_tags(jp)
    flat_p = optim.flatten_tree(jp)
    st = optim.init_flat_opt_state(opt_name, meta.total)
    fn = optim.make_flat_update_fn(opt_name, wd, nesterov=True)
    for t in range(1, steps + 1):
        flat_p, st = fn(flat_p, optim.flatten_tree(jg), st, tags, lr, lr_bias,
                        momentum, jnp.asarray(t, jnp.int32))
    out = meta.unflatten(flat_p)
    return {k: {n: np.asarray(v) for n, v in sub.items()} for k, sub in out.items()}


@pytest.mark.parametrize("opt_name", ["sgd", "adam", "adamw", "rmsprop"])
def test_flat_update_matches_tree(opt_name):
    params, grads = _tree()
    tree_out = _jax_step(opt_name, params, grads, WD, LR, LRB, MOM, steps=3)
    flat_out = _flat_steps(opt_name, params, grads, WD, LR, LRB, MOM, steps=3)
    for k in tree_out:
        for n in tree_out[k]:
            np.testing.assert_array_equal(
                flat_out[k][n], tree_out[k][n], err_msg=f"{opt_name} {k}/{n}"
            )


def test_flat_clip_and_ema_match_tree():
    params, grads = _tree()
    jp = {k: {n: jnp.asarray(v) for n, v in sub.items()} for k, sub in params.items()}
    jg = {k: {n: jnp.asarray(v * 100.0) for n, v in sub.items()} for k, sub in grads.items()}
    meta = optim.FlatMeta(jp)
    # clip: summation ORDER differs (per-leaf partial sums vs one reduction),
    # so allclose instead of array_equal for the norm-derived scale
    tree_g = optim.clip_by_global_norm(jg, 10.0)
    flat_g = optim.clip_by_global_norm_flat(optim.flatten_tree(jg), 10.0)
    np.testing.assert_allclose(
        np.asarray(flat_g), np.asarray(optim.flatten_tree(tree_g)), rtol=1e-6
    )
    # EMA: identical lerp
    upd = jnp.asarray(7, jnp.int32)
    tree_e = optim.ema_update(jp, jg, upd, 0.9999, 2000.0)
    flat_e = optim.ema_update_flat(optim.flatten_tree(jp), optim.flatten_tree(jg),
                                   upd, 0.9999, 2000.0)
    np.testing.assert_array_equal(np.asarray(flat_e),
                                  np.asarray(optim.flatten_tree(tree_e)))


def test_flat_meta_roundtrip():
    params, _ = _tree()
    jp = {k: {n: jnp.asarray(v) for n, v in sub.items()} for k, sub in params.items()}
    meta = optim.FlatMeta(jp)
    back = meta.unflatten(optim.flatten_tree(jp))
    assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(jp)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(jp)):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
