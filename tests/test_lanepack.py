"""Lane-packing equivalence: the folded-conv packed backbone is the SAME model.

models/lanepack.py re-lays-out the small-channel backbone prefix for TPU lane
efficiency; it must be numerically equivalent (same logical multiply-adds,
re-associated) and parameter-compatible (identical param/batch_stats trees) so
checkpoints interchange. Pinned here on CPU in fp32.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mga_yolo_tpu.models.lanepack import (
    PackedConvBN,
    expand_folded_kernel,
    pack_width,
    plan_packed_section,
    unpack_width,
)
from mga_yolo_tpu.models.layers import ConvBN
from mga_yolo_tpu.models.yolo import MGAModel, create_model


def test_folded_kernel_exact():
    """Folded conv == plain conv for every backbone shape class."""
    rng = np.random.default_rng(0)
    for (cin, cout, k, s, f_in, H, W) in [
        (3, 16, 3, 2, 16, 64, 64),    # stem
        (16, 32, 3, 2, 8, 32, 32),    # stride-2 transitions
        (32, 32, 3, 1, 4, 16, 16),    # C2f inner 3x3
        (16, 16, 1, 1, 8, 32, 32),    # 1x1 (block-diagonal)
        (64, 128, 3, 2, 2, 16, 16),   # section exit
    ]:
        x = jnp.asarray(rng.standard_normal((2, H, W, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, k, cin, cout)) * 0.1, jnp.float32)
        pad = k // 2
        ref = jax.lax.conv_general_dilated(
            x, w, (s, s), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        K, (pl, pr) = expand_folded_kernel(w, f_in, s)
        got = jax.lax.conv_general_dilated(
            pack_width(x, f_in), K, (s, 1), ((pad, pad), (pl, pr)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = unpack_width(got, f_in // s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_packed_convbn_param_compatible():
    """PackedConvBN init tree == ConvBN init tree (names, shapes, dtypes)."""
    x = jnp.zeros((1, 32, 32, 16), jnp.float32)
    ref = ConvBN(32, 3, 2).init(jax.random.PRNGKey(0), x, train=False)
    packed = PackedConvBN(16, 32, 3, 2, f_in=8).init(
        jax.random.PRNGKey(0), pack_width(x, 8), train=False
    )
    ref_s = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), ref)
    got_s = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), packed)
    assert ref_s == got_s


def test_plan_packed_section_n_scale():
    _, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    plan = plan_packed_section(spec)
    # backbone prefix + the P3 neck region (C3k2 l15 + downsample Conv l16)
    assert plan == {0: (16, 8), 1: (8, 4), 2: (4, 4), 3: (4, 2), 4: (2, 2), 5: (2, 1),
                    15: (2, 2), 16: (2, 1)}
    # 256-lane packing goes deeper (C2f halves stay on >=128 lanes)
    deep = plan_packed_section(spec, target_lanes=256)
    for idx in (0, 1, 2, 3, 4, 5, 6, 7, 15, 16):
        assert idx in deep
    assert deep[0] == (32, 16) and deep[7] == (2, 1) and deep[15] == (4, 4)


def test_packed_model_equivalence_256_lanes():
    """eval-mode forward equivalence at the deeper 256-lane packing."""
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    packed = MGAModel(spec=spec, lane_pack=True, lane_pack_lanes=256)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    ref = model.apply(variables, x, train=False)
    got = packed.apply(variables, x, train=False)
    for k in ("p3", "p4", "p5"):
        np.testing.assert_allclose(
            np.asarray(got["seg"][k]), np.asarray(ref["seg"][k]), rtol=1e-4, atol=1e-4
        )
    np.testing.assert_allclose(
        np.asarray(got["det"][0]), np.asarray(ref["det"][0]), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("train", [False, True])
def test_packed_model_equivalence(train):
    """Full-model forward (and batch_stats updates) match with lane_pack on.

    The packed model consumes the SAME variables as the unpacked one — this
    is the checkpoint-interchange guarantee.
    """
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    packed = MGAModel(spec=spec, lane_pack=True)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    pv = packed.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree_util.tree_map(lambda a: a.shape, variables) == jax.tree_util.tree_map(
        lambda a: a.shape, pv
    )

    kwargs = dict(train=train)
    if train:
        ref, ref_upd = model.apply(variables, x, mutable=["batch_stats"], **kwargs)
        got, got_upd = packed.apply(variables, x, mutable=["batch_stats"], **kwargs)
        ref_bs = jax.tree_util.tree_leaves(ref_upd)
        got_bs = jax.tree_util.tree_leaves(got_upd)
        for a, b in zip(ref_bs, got_bs):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)
    else:
        ref = model.apply(variables, x, **kwargs)
        got = packed.apply(variables, x, **kwargs)

    # tolerance note (round 4): packed and unpacked now ALSO differ in f32
    # reduction order inside BN batch stats (PackedBN reduces (B,H,W') then
    # folds slots; flax BN reduces the unpacked (B,H,W)) and in the virtual-
    # concat 1x1 convs (per-part f32 partial sums). ~1 ulp per BN cascades
    # through rsqrt over ~8 layers -> a few 1e-4 relative on the deepest
    # taps; grads/mAP are unaffected (grad-equivalence test below, mAP
    # parity BASELINE.md).
    for k in ("p3", "p4", "p5"):
        np.testing.assert_allclose(
            np.asarray(got["seg"][k]), np.asarray(ref["seg"][k]), rtol=5e-4, atol=2e-4
        )
    ref_det = ref["det"] if train else ref["det"][1]
    got_det = got["det"] if train else got["det"][1]
    for a, b in zip(jax.tree_util.tree_leaves(ref_det), jax.tree_util.tree_leaves(got_det)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=5e-4, atol=2e-4)


def test_packed_model_grad_equivalence():
    """Param gradients through the packed prologue match the unpacked model."""
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    packed = MGAModel(spec=spec, lane_pack=True)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(m):
        def f(params):
            out, _ = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"],
            )
            leaves = jax.tree_util.tree_leaves((out["det"], out["seg"]))
            return sum(jnp.sum(jnp.square(l)) for l in leaves)

        return jax.grad(f)(variables["params"])

    g_ref = loss(model)
    g_got = loss(packed)
    flat_ref = jax.tree_util.tree_flatten_with_path(g_ref)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(g_got)[0]
    assert len(flat_ref) == len(flat_got)
    for (p_r, a), (p_g, b) in zip(flat_ref, flat_got):
        assert p_r == p_g
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        # normwise: fp32 accumulation order differs by design (folded conv
        # re-associates the same multiply-adds); elementwise rtol is the wrong
        # criterion for near-cancelling large sums
        denom = np.linalg.norm(a) + 1e-6
        assert np.linalg.norm(b - a) / denom < 1e-3, (str(p_r), np.linalg.norm(b - a) / denom)
