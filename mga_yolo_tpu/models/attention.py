"""Mask-guided attention refinement modules (NHWC, jit-safe).

Functional re-implementations of the three reference attention variants:

* :class:`MaskCBAM`  — `/root/reference/mga_yolo/nn/modules/masked_cbam.py:10-174`
* :class:`MaskECA`   — `/root/reference/mga_yolo/nn/modules/masked_eca.py:68-200`
* :class:`MaskSPADE` — `/root/reference/mga_yolo/nn/modules/masked_spade.py:40-146`
* :class:`ProbMaskGater` — `/root/reference/mga_yolo/nn/modules/probmaskgater.py:8-98`

Design notes (TPU):
* All data-dependent branches of the reference (tiny-mask GAP fallback,
  all-masked-out max fallback) become ``jnp.where`` blends so a single trace
  covers every case — no dynamic control flow under jit.
* Masks arrive as logits from :class:`MGAMaskHead` and are sigmoided
  internally (``use_sigmoid_mask=True`` in the reference defaults).
* The masked avg/max + MLP channel-attention inner loop is the target of the
  fused Pallas kernel in ``mga_yolo_tpu.ops.pallas``; this module is the
  XLA reference implementation used for parity tests.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mga_yolo_tpu.models.layers import kaiming_out, resize_bilinear, torch_bias_init, torch_default


def _sigmoid_mask(mask: jax.Array, use_sigmoid: bool) -> jax.Array:
    return jax.nn.sigmoid(mask) if use_sigmoid else mask


class ProbMaskGater(nn.Module):
    """Differentiable spatial gate over probability masks.

    Modes (reference probmaskgater.py:13-18):
      deterministic: M = p
      gumbel:        M = sigmoid((logit(p) + logistic_noise) / tau)
      hard_st:       straight-through threshold of the gumbel sample
      bernoulli_detach: Bernoulli(stop_grad(p))
    Eval mode is always deterministic (reference :82-83).
    Randomness uses the flax 'gater' RNG collection.
    """

    mode: str = "gumbel"
    tau: float = 1.0
    p_min: float = 0.0
    threshold: float = 0.5

    @nn.compact
    def __call__(self, p: jax.Array, train: bool = False) -> jax.Array:
        p = jnp.clip(p.astype(jnp.float32), 0.0, 1.0)
        if self.p_min > 0:
            p = jnp.maximum(p, self.p_min)
        if not train or self.mode == "deterministic":
            return p
        if self.mode == "bernoulli_detach":
            rng = self.make_rng("gater")
            return jax.random.bernoulli(rng, jax.lax.stop_gradient(p)).astype(p.dtype)
        # gumbel / hard_st need logistic noise
        rng = self.make_rng("gater")
        u1, u2 = jax.random.split(rng)
        eps = 1e-6
        U1 = jnp.clip(jax.random.uniform(u1, p.shape), eps, 1 - eps)
        U2 = jnp.clip(jax.random.uniform(u2, p.shape), eps, 1 - eps)
        g = -jnp.log(-jnp.log(U1)) + jnp.log(-jnp.log(U2))
        pc = jnp.clip(p, eps, 1 - eps)
        logits = jnp.log(pc) - jnp.log1p(-pc)
        m_soft = jax.nn.sigmoid((logits + g) / self.tau)
        if self.mode == "gumbel":
            return m_soft
        if self.mode == "hard_st":
            m_hard = (m_soft > self.threshold).astype(m_soft.dtype)
            return m_hard + (m_soft - jax.lax.stop_gradient(m_soft))
        return p


def masked_avg_pool(
    x: jax.Array, m: jax.Array, tiny_thr: float = 1e-4, eps: float = 1e-6
) -> jax.Array:
    """Masked average over HW with tiny-mask GAP blend.

    x: (B,H,W,C); m: (B,H,W,1) probabilities. Returns (B,C).
    Matches reference masked_cbam.py:87-102 / masked_eca.py:139-164: when the
    mean mask value is below ``tiny_thr`` the descriptor falls back to GAP,
    blended per-batch-element.
    """
    msum = jnp.sum(m, axis=(1, 2))  # (B,1)
    mavg = jnp.sum(x * m, axis=(1, 2)) / jnp.maximum(msum, eps)  # (B,C)
    gap = jnp.mean(x, axis=(1, 2))
    valid = (jnp.mean(m, axis=(1, 2)) >= tiny_thr).astype(x.dtype)  # (B,1)
    return mavg * valid + gap * (1.0 - valid)


def masked_max_pool(x: jax.Array, m: jax.Array) -> jax.Array:
    """Masked max over HW; falls back to GAP where no pixel has m > 0.5.

    Matches reference masked_cbam.py:104-121 (finfo.min sentinel + fallback).
    """
    neg = jnp.finfo(x.dtype).min
    sel = m > 0.5  # (B,H,W,1)
    x_masked = jnp.where(sel, x, neg)
    mmax = jnp.max(x_masked, axis=(1, 2))  # (B,C)
    gap = jnp.mean(x, axis=(1, 2))
    any_valid = jnp.any(sel, axis=(1, 2)).astype(bool)  # (B,1)
    return jnp.where(any_valid, mmax, gap)


class MaskCBAM(nn.Module):
    """Mask-guided CBAM: masked channel attention + mask-aware spatial attention.

    out = x + softplus(beta) * (SAM(CAM(x)) - x)   (reference :150-171)
    """

    channels: int
    r: int = 16
    spatial_k: int = 7
    use_sigmoid_mask: bool = True
    tiny_mask_thr: float = 1e-4
    eps: float = 1e-6
    prob_mode: bool = False
    prob_approach: str = "gumbel"
    use_pallas: bool = False  # fused masked-pool kernel (TPU)

    @nn.compact
    def __call__(
        self, feat: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        C = feat.shape[-1]
        hidden = max(1, C // self.r)

        if self.prob_mode and mask is not None:
            mask = ProbMaskGater(mode=self.prob_approach, name="gater")(mask, train)

        # ---- CAM: masked avg/max descriptors -> shared MLP -> sigmoid gate ----
        # fully-fused Pallas path: reductions + MLP + sigmoid in ONE pass over
        # HBM (ops/pallas/masked_pool.py cam_gate_fused). The param tree is
        # identical to the XLA path: the Dense modules below create the
        # cam_fc1/cam_fc2 params during init, the fused path reads them back.
        fuse_cam = mask is not None and self.use_pallas and not self.is_initializing()
        if fuse_cam:
            from mga_yolo_tpu.ops.pallas.masked_pool import cam_gate_fused

            m = _sigmoid_mask(mask, self.use_sigmoid_mask)
            p1 = self.get_variable("params", "cam_fc1")
            p2 = self.get_variable("params", "cam_fc2")
            y = cam_gate_fused(
                feat, m, p1["kernel"], p1["bias"], p2["kernel"], p2["bias"],
                self.tiny_mask_thr, self.eps,
            ).astype(feat.dtype)
        else:
            if mask is not None:
                m = _sigmoid_mask(mask, self.use_sigmoid_mask)
                avg = masked_avg_pool(feat, m, self.tiny_mask_thr, self.eps)
                mx = masked_max_pool(feat, m)
            else:
                avg = jnp.mean(feat, axis=(1, 2))
                mx = jnp.max(feat, axis=(1, 2))
            # reference MLP = nn.Linear pair with torch default init (:55-57)
            mlp = nn.Sequential(
                [
                    nn.Dense(hidden, kernel_init=torch_default,
                             bias_init=torch_bias_init(C), name="cam_fc1"),
                    nn.relu,
                    nn.Dense(C, kernel_init=torch_default,
                             bias_init=torch_bias_init(hidden), name="cam_fc2"),
                ]
            )
            y = jax.nn.sigmoid(mlp(avg) + mlp(mx)).astype(feat.dtype)  # (B,C)
        cam_out = feat * y[:, None, None, :]

        # ---- SAM: conv over [chan-max, chan-avg, mask] ----
        x_max = jnp.max(cam_out, axis=-1, keepdims=True)
        x_avg = jnp.mean(cam_out, axis=-1, keepdims=True)
        H, W = feat.shape[1], feat.shape[2]
        if mask is None:
            m_plane = jnp.zeros((feat.shape[0], H, W, 1), feat.dtype)
        else:
            m_plane = resize_bilinear(mask, (H, W))
            m_plane = _sigmoid_mask(m_plane, self.use_sigmoid_mask).astype(feat.dtype)
        k = self.spatial_k if self.spatial_k % 2 == 1 else self.spatial_k + 1
        att = nn.Conv(
            1, (k, k), padding=((k // 2, k // 2), (k // 2, k // 2)), use_bias=False,
            kernel_init=torch_default, name="sam_conv"
        )(jnp.concatenate([x_max, x_avg, m_plane], axis=-1))
        sam_out = cam_out * jax.nn.sigmoid(att).astype(feat.dtype)

        # ---- alpha-modulated residual ----
        beta = self.param("beta", nn.initializers.zeros, (), jnp.float32)
        a = jax.nn.softplus(beta).astype(sam_out.dtype)
        return feat + a * (sam_out - feat)


def eca_kernel_size(
    channels: int, gamma: float = 2.0, b: float = 1.0, k_min: int = 3, k_max: int = 15
) -> int:
    """Adaptive 1D kernel size (reference masked_eca.py:44-53, bit_length log2)."""
    if channels <= 0:
        return k_min
    k = int(abs((channels.bit_length() - 1) / gamma + b))
    k = max(k_min, min(k, k_max))
    return k if k % 2 == 1 else k + 1


class MaskECA(nn.Module):
    """Mask-guided efficient channel attention.

    g = 1 + softplus(beta) * (sigmoid(conv1d(pool(x, m))) - 0.5);  out = x * g
    (reference masked_eca.py:166-192)
    """

    channels: int
    gamma: float = 2.0
    b: float = 1.0
    k_min: int = 3
    k_max: int = 15
    use_sigmoid_mask: bool = True
    tiny_mask_thr: float = 1e-4
    eps: float = 1e-6
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, feat: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        C = feat.shape[-1]
        if mask is not None and self.use_pallas:
            from mga_yolo_tpu.ops.pallas.masked_pool import masked_pool_fused

            m = _sigmoid_mask(mask, self.use_sigmoid_mask)
            y, _ = masked_pool_fused(feat, m, self.tiny_mask_thr, self.eps)
        elif mask is not None:
            m = _sigmoid_mask(mask, self.use_sigmoid_mask)
            y = masked_avg_pool(feat, m, self.tiny_mask_thr, self.eps)  # (B,C)
        else:
            y = jnp.mean(feat, axis=(1, 2))
        k = eca_kernel_size(C, self.gamma, self.b, self.k_min, self.k_max)
        # 1D conv over the channel axis: treat C as the spatial dim.
        w = jax.nn.sigmoid(
            nn.Conv(1, (k,), padding=((k // 2, k // 2),), use_bias=False,
                    kernel_init=torch_default, name="conv1d")(
                y[:, :, None]
            ).squeeze(-1)
        )  # (B,C)
        beta = self.param("beta", nn.initializers.zeros, (), jnp.float32)
        alpha = jax.nn.softplus(beta).astype(w.dtype)
        g = (1.0 + alpha * (w - 0.5)).astype(feat.dtype)
        return feat * g[:, None, None, :]


class MaskSPADE(nn.Module):
    """SPADE/FiLM normalization conditioned on the mask.

    y = gamma(m) * InstanceNorm(x) + beta(m)   (reference masked_spade.py:113-139)
    """

    channels: int
    hidden: int = 64
    mask_channels: int = 1
    norm_type: str = "in"
    use_sigmoid_mask: bool = True
    eps: float = 1e-6

    @nn.compact
    def __call__(
        self, feat: jax.Array, mask: Optional[jax.Array] = None, train: bool = False
    ) -> jax.Array:
        if self.norm_type == "bn":
            # reference initialize_weights overrides BN to eps 1e-3, m 0.03
            x_hat = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                use_bias=False,
                use_scale=False,
                name="norm",
            )(feat)
        else:
            # Affine-free instance norm over H,W per channel.
            mu = jnp.mean(feat, axis=(1, 2), keepdims=True)
            var = jnp.var(feat, axis=(1, 2), keepdims=True)
            x_hat = (feat - mu) * jax.lax.rsqrt(var + self.eps)

        if mask is None:
            return x_hat

        H, W = feat.shape[1], feat.shape[2]
        m = resize_bilinear(mask, (H, W))
        m = _sigmoid_mask(m, self.use_sigmoid_mask)
        h = nn.relu(
            nn.Conv(
                self.hidden,
                (3, 3),
                padding=((1, 1), (1, 1)),
                kernel_init=kaiming_out,
                bias_init=nn.initializers.zeros,
                name="shared",
            )(m)
        )
        gamma = nn.Conv(
            self.channels, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=kaiming_out, bias_init=nn.initializers.zeros, name="conv_gamma",
        )(h)
        beta = nn.Conv(
            self.channels, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=kaiming_out, bias_init=nn.initializers.zeros, name="conv_beta",
        )(h)
        return gamma.astype(feat.dtype) * x_hat + beta.astype(feat.dtype)
