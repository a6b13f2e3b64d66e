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
