"""Pallas NMS: parity with the XLA nms_jax on identical inputs."""

import jax
import jax.numpy as jnp
import numpy as np

from mga_yolo_tpu.ops.nms import nms_jax
import mga_yolo_tpu.ops.pallas.nms as pnms


def _pred(b=2, a=256, nc=2, seed=0):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(40, 200, (b, a, 2))
    wh = rng.uniform(10, 60, (b, a, 2))
    probs = rng.uniform(0, 1, (b, a, nc)) ** 3
    return jnp.asarray(np.concatenate([xy, wh, probs], -1).astype(np.float32))


def _run_interpret(fn, *args, **kw):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    pnms.pl.pallas_call = interp_call
    try:
        return fn(*args, **kw)
    finally:
        pnms.pl.pallas_call = orig


def test_pallas_nms_matches_xla():
    pred = _pred()
    for multi_label in (False, True):
        bx, sx, cx = nms_jax(pred, conf_thres=0.1, iou_thres=0.45, max_det=50,
                             max_nms=256, multi_label=multi_label)
        bp, sp, cp = _run_interpret(
            pnms.nms_jax_pallas, pred, conf_thres=0.1, iou_thres=0.45, max_det=50,
            max_nms=256, multi_label=multi_label,
        )
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sx), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(cp), np.asarray(cx))
        # compare boxes only where a detection survived (padding rows are
        # arbitrary ties at score 0)
        live = np.asarray(sx) > 0
        np.testing.assert_allclose(
            np.asarray(bp)[live], np.asarray(bx)[live], rtol=1e-5, atol=1e-5
        )


def test_pallas_nms_empty():
    pred = _pred(seed=1)
    pred = pred.at[..., 4:].set(0.0)  # nothing above conf
    b, s, c = _run_interpret(pnms.nms_jax_pallas, pred, conf_thres=0.5, max_nms=128)
    assert float(jnp.sum(s)) == 0.0
    assert np.all(np.asarray(c) == -1.0)
