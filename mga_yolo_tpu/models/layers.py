"""Flax (linen) building blocks for the YOLOv8/MGA graph — NHWC, bf16-friendly.

Functional re-implementations of the reference blocks
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/nn/modules/conv.py:38` Conv,
`block.py:216` SPPF, `block.py:294` C2f, `block.py:329` C3, `block.py:470` Bottleneck,
`block.py:1107` C3k2, `block.py:1131` C3k), designed TPU-first:

* NHWC activations / HWIO kernels (XLA's preferred conv layout on TPU).
* Explicit symmetric padding (k//2) so geometry matches the reference's
  torch ``autopad`` exactly (torch pads symmetrically; XLA "SAME" does not
  for even inputs with stride 2).
* Static shapes; everything traces once under ``jit``.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mga_yolo_tpu import perf

# Kaiming-normal (fan_out) — used by the reference mask head / SPADE init
kaiming_out = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# torch's default Conv2d/Linear init, which the reference keeps for every
# backbone/neck/head conv (initialize_weights leaves Conv2d untouched,
# reference torch_utils.py:564-574): kaiming_uniform(a=sqrt(5)) ==
# U(-1/sqrt(fan_in), +1/sqrt(fan_in)), i.e. variance 1/(3*fan_in) — 3x
# tighter than flax's lecun_normal default. Matching the init distribution
# matters for training-parity with the reference (BASELINE.md mAP50-95 gap).
torch_default = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    """torch's default bias init: U(-1/sqrt(fan_in), +1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def autopad(k: int, p: int | None = None, d: int = 1) -> int:
    """'Same'-shape padding, matching reference conv.py:29."""
    if d > 1:
        k = d * (k - 1) + 1
    return k // 2 if p is None else p


class ConvBN(nn.Module):
    """Conv2d (no bias) + BatchNorm + SiLU, the reference's `Conv` (conv.py:38).

    Attributes:
        c2: output channels.
        k: square kernel size.
        s: stride.
        p: explicit padding (None -> k//2).
        g: feature groups (g == c_in gives a depthwise conv, reference DWConv).
        d: dilation.
        act: apply SiLU when True, identity otherwise.
    """

    c2: int
    k: int = 1
    s: int = 1
    p: int | None = None
    g: int = 1
    d: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        pad = autopad(self.k, self.p, self.d)
        x = nn.Conv(
            features=self.c2,
            kernel_size=(self.k, self.k),
            strides=(self.s, self.s),
            padding=((pad, pad), (pad, pad)),
            feature_group_count=self.g,
            kernel_dilation=(self.d, self.d),
            use_bias=False,
            kernel_init=torch_default,
            name="conv",
        )(x)
        # reference initialize_weights sets BN eps=1e-3, momentum=0.03 on every
        # BatchNorm2d (torch_utils.py:570-572); flax momentum = 1 - torch
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, name="bn"
        )(x)
        return nn.silu(x) if self.act else x


class _Conv1x1Sum(nn.Module):
    """1x1 conv over a VIRTUAL concatenation: ``conv(concat(parts))`` computed
    as the sum of per-part row-sliced matmuls — the concat (and its backward
    split/pad) never materializes. Parameter-identical to
    ``nn.Conv(c2, (1,1), name=...)`` on the concatenated input. Numerics: each
    part accumulates on the MXU in f32; with the default ``perf.vconcat_acc
    = "f32"`` the partial sums also add in f32 before one cast to the
    activation dtype — the only deviation from the single conv is f32
    summation order (~1 ulp), inside every parity tolerance. With
    ``vconcat_acc="bf16"`` each partial is instead rounded once to bf16
    before the adds (halves the partials' HBM write/read bytes; rounding
    enters each element once, before a BatchNorm).

    Motivation (round-4 per-op table, BASELINE.md): the C2f/SPPF concats and
    their backward slices/pads are among the largest elementwise entries in
    the train step (~1.1 ms fwd + ~1.6 ms bwd at b128/640 for l2_C2f alone).
    """

    c2: int
    c_in: int

    @nn.compact
    def __call__(self, parts: Sequence[jax.Array]) -> jax.Array:
        w = self.param("kernel", torch_default, (1, 1, self.c_in, self.c2))
        knobs = perf.active()
        # hybrid rule: per-part matmuls have contraction depth K = part
        # channels; below perf.vconcat_min_k (config key vconcat_min_k /
        # bench env MGA_VCONCAT_MIN_K, A/B'd on chip — BASELINE.md round 4)
        # the tiny-K matmuls starve the MXU worse than one materialized
        # concat + a single K=c_in conv costs, so narrow parts take the
        # concat path. With the default f32 accumulation the two paths are
        # value-identical up to f32 summation order; with vconcat_acc=bf16
        # the virtual path additionally rounds each partial to bf16 while
        # this concat fallback stays f32 (the fallback exists to feed the
        # MXU better, not to change numerics — it keeps the exact path).
        if len(parts) > 1 and min(p.shape[-1] for p in parts) < knobs.vconcat_min_k:
            x = jnp.concatenate(list(parts), axis=-1)
            y = jnp.einsum(
                "bhwc,co->bhwo", x, w[0, 0].astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            return y.astype(x.dtype)
        # partial-sum dtype: f32 keeps the exact single-conv summation order;
        # bf16 halves the HBM write traffic of every partial (the round-4
        # SoL table shows these dots' f32 outputs are the largest avoidable
        # byte stream on l2/l4/l15 — each partial is written once and read
        # once, so bf16 rounding enters each element once, before a BN).
        # Selected by perf.vconcat_acc (config key / bench env MGA_VCONCAT_ACC).
        acc_t = jnp.float32 if knobs.vconcat_acc == "f32" else None
        off, acc = 0, None
        for p in parts:
            ci = p.shape[-1]
            y = jnp.einsum(
                "bhwc,co->bhwo",
                p,
                w[0, 0, off : off + ci, :].astype(p.dtype),
                preferred_element_type=acc_t,
            )
            acc = y if acc is None else acc + y
            off += ci
        assert off == self.c_in, f"parts sum to {off}, kernel expects {self.c_in}"
        return acc.astype(parts[0].dtype)


class ConvBNSum(nn.Module):
    """``ConvBN(c2, 1, 1)`` applied to a virtual concatenation of parts.

    Same parameter tree as ConvBN (children ``conv``/``bn``), so checkpoints
    and parity tests interchange freely.
    """

    c2: int
    act: bool = True

    @nn.compact
    def __call__(self, parts: Sequence[jax.Array], train: bool = False) -> jax.Array:
        c_in = sum(p.shape[-1] for p in parts)
        # The virtual sum pays off in the BACKWARD (no concat cotangent
        # slice/pads); forward-only it splits one good matmul into tiny-K
        # ones — measured −28% inference (bench.py 5306→3832 img/s, round 4)
        # — so eval materializes the concat (value-identical, same params).
        if not train and len(parts) > 1:
            parts = [jnp.concatenate(list(parts), axis=-1)]
        x = _Conv1x1Sum(self.c2, c_in, name="conv")(parts)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, name="bn"
        )(x)
        return nn.silu(x) if self.act else x


class DWConv(nn.Module):
    """Depthwise Conv+BN+SiLU (reference conv.py:195)."""

    c2: int
    k: int = 1
    s: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        g = math.gcd(x.shape[-1], self.c2)
        return ConvBN(self.c2, self.k, self.s, g=g, act=self.act, name="dw")(x, train)


class Bottleneck(nn.Module):
    """Standard bottleneck (reference block.py:470)."""

    c2: int
    shortcut: bool = True
    g: int = 1
    k: tuple[int, int] = (3, 3)
    e: float = 0.5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y = ConvBN(c_, self.k[0], 1, name="cv1")(x, train)
        y = ConvBN(self.c2, self.k[1], 1, g=self.g, name="cv2")(y, train)
        return x + y if self.shortcut and x.shape[-1] == self.c2 else y


class C2f(nn.Module):
    """Fast CSP bottleneck with 2 convs (reference block.py:294)."""

    c2: int
    n: int = 1
    shortcut: bool = False
    g: int = 1
    e: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        # `x` may be a LIST of parts (a lazily-deferred upstream Concat —
        # models/yolo.py walker): cv1 is 1x1, so it consumes the parts
        # directly and the neck concat never materializes.
        c = int(self.c2 * self.e)
        if isinstance(x, (list, tuple)):
            y = ConvBNSum(2 * c, name="cv1")(list(x), train)
        else:
            y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            ys.append(
                Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=1.0, name=f"m{i}")(ys[-1], train)
            )
        return ConvBNSum(self.c2, name="cv2")(ys, train)


class C3(nn.Module):
    """CSP bottleneck with 3 convs (reference block.py:329)."""

    c2: int
    n: int = 1
    shortcut: bool = True
    g: int = 1
    e: float = 0.5
    k: int = 3  # inner bottleneck kernel (C3k uses (k,k); plain C3 uses (1,3))
    c3k_kernels: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        a = ConvBN(c_, 1, 1, name="cv1")(x, train)
        for i in range(self.n):
            kk = (self.k, self.k) if self.c3k_kernels else (1, 3)
            a = Bottleneck(c_, self.shortcut, self.g, k=kk, e=1.0, name=f"m{i}")(a, train)
        b = ConvBN(c_, 1, 1, name="cv2")(x, train)
        return ConvBNSum(self.c2, name="cv3")([a, b], train)


class C3k2(nn.Module):
    """C2f whose inner blocks are C3k (YOLO11 neck block, reference block.py:1107).

    With ``c3k=False`` the inner block is a plain Bottleneck with e=0.5
    (NOT e=1.0 like C2f's — see reference block.py:1126).
    """

    c2: int
    n: int = 1
    c3k: bool = False
    e: float = 0.5
    g: int = 1
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False) -> jax.Array:
        # list input = lazily-deferred upstream Concat (see C2f / the walker)
        c = int(self.c2 * self.e)
        if isinstance(x, (list, tuple)):
            y = ConvBNSum(2 * c, name="cv1")(list(x), train)
        else:
            y = ConvBN(2 * c, 1, 1, name="cv1")(x, train)
        ys = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            if self.c3k:
                blk = C3(c, 2, self.shortcut, self.g, c3k_kernels=True, k=3, name=f"m{i}")
            else:
                blk = Bottleneck(c, self.shortcut, self.g, k=(3, 3), e=0.5, name=f"m{i}")
            ys.append(blk(ys[-1], train))
        return ConvBNSum(self.c2, name="cv2")(ys, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling — fast (reference block.py:216)."""

    c2: int
    k: int = 5

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        c_ = x.shape[-1] // 2
        y = ConvBN(c_, 1, 1, name="cv1")(x, train)
        p = self.k // 2
        outs = [y]
        for _ in range(3):
            if train:
                # SEPARABLE max pool: mp(k,k) == mp(1,k) ∘ mp(k,1) exactly
                # (max is associative/commutative). The win is the BACKWARD:
                # XLA lowers maxpool-grad to select_and_scatter whose cost
                # scales with window size — two window-k scatters beat one
                # window-k² (round-4 per-op table: 3x 0.62 ms on 13 MB
                # tensors). Tie routing may pick a different (equally
                # arbitrary) max witness. Forward-only the single fused pool
                # reads the tensor once, so eval keeps it.
                z = nn.max_pool(
                    outs[-1], (1, self.k), strides=(1, 1), padding=((0, 0), (p, p))
                )
                outs.append(
                    nn.max_pool(z, (self.k, 1), strides=(1, 1), padding=((p, p), (0, 0)))
                )
            else:
                outs.append(
                    nn.max_pool(
                        outs[-1], (self.k, self.k), strides=(1, 1), padding=((p, p), (p, p))
                    )
                )
        return ConvBNSum(self.c2, name="cv2")(outs, train)


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample (reference nn.Upsample [None, 2, 'nearest']).

    Implemented as reshape+broadcast — cheaper than gather-based resize on TPU.
    """
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def resize_bilinear(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize to (H, W), matching torch F.interpolate(align_corners=False)."""
    b, h, w, c = x.shape
    if (h, w) == hw:
        return x
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="bilinear")


def resize_nearest(x: jax.Array, hw: tuple[int, int]) -> jax.Array:
    b, h, w, c = x.shape
    if (h, w) == hw:
        return x
    return jax.image.resize(x, (b, hw[0], hw[1], c), method="nearest")
