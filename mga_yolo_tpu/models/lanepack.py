"""Lane packing — fold image width into the channel (lane) dim for small-C layers.

TPU memory tiles are (sublane, 128-lane): XLA pads the minor (channel) dim of
every NHWC tensor to 128 lanes, so a C=16 activation costs 8x its logical
bytes in HBM traffic and a C=3 image up to 42x. On-chip measurement
(tools/scripts/bench_c2f_bisect.py) put the early YOLOv8 backbone layers at
~16x worse per-FLOP throughput than FLOPs-matched C=128 shapes — the
train-step backward is dominated by exactly these layers.

The fix implemented here: keep early activations in a *packed* layout

    X'[b, h, w', u] = X[b, h, f*w' + u//C, u % C]        (block layout, u = s*C + c)

so every tensor carries C*f >= 128 real lanes, and run each conv as a
*folded conv* whose kernel is expanded on the fly from the logical HWIO
weights:

    K'[kh, bwo, s_in*Cin + cin, t*Cout + cout] += W[kh, dw, cin, cout]
       for every (t, dw) with  s*t + dw - pad = f_in*bwo + s_in

This is numerically EXACT (same multiply-adds, re-associated): the packing
factor chain is forced to f_in = stride * f_out, so a stride-2 conv halves f
and the section exits to the standard layout exactly when C reaches 128.
FLOPs inflate by f_in (the expanded kernel is mostly zeros) but they run on
an otherwise idle MXU; HBM traffic — the actual bottleneck — drops ~8x for
the C=16 stage. Parameters are IDENTICAL to the unpacked modules (same
names, same logical shapes — `conv/kernel`, `bn/{scale,bias}` +
`batch_stats`), so checkpoints and parity tests interchange freely;
equivalence is pinned by tests/test_lanepack.py.

No reference equivalent — this is TPU-specific performance work on the
"beat the baseline" axis (the reference's CUDA path has no lane-padding
problem; cuDNN handles NCHW C=16 natively).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from mga_yolo_tpu import perf

from mga_yolo_tpu.models.layers import autopad, torch_default


def pack_width(x: jax.Array, f: int) -> jax.Array:
    """[B,H,W,C] -> [B,H,W/f, f*C] (block layout: lane u = slot*C + c)."""
    if f == 1:
        return x
    b, h, w, c = x.shape
    return x.reshape(b, h, w // f, f * c)


def unpack_width(x: jax.Array, f: int) -> jax.Array:
    """Inverse of :func:`pack_width`."""
    if f == 1:
        return x
    b, h, wp, fc = x.shape
    return x.reshape(b, h, wp * f, fc // f)


def expand_folded_kernel(w: jax.Array, f_in: int, s: int) -> tuple[jax.Array, tuple[int, int]]:
    """Expand logical HWIO kernel (kh,kw,Cin,Cout) to the folded-conv kernel.

    Returns (K', (pad_left, pad_right)) where K' has shape
    (kh, n_bwo, Cin*f_in, Cout*f_out), f_out = f_in // s, and n_bwo is the
    minimal packed-width kernel extent. Pure slice-writes — autodiff flows
    back to the logical kernel exactly.
    """
    kh, kw, cin, cout = w.shape
    f_out = f_in // s
    pad = autopad(kw)
    # enumerate (t, dw) -> (bwo, s_in)
    entries = []
    for t in range(f_out):
        for dw in range(kw):
            rel = s * t + dw - pad
            entries.append((rel // f_in, rel % f_in, dw, t))
    bwos = [e[0] for e in entries]
    lo, hi = min(bwos), max(bwos)
    n_bwo = hi - lo + 1
    K = jnp.zeros((kh, n_bwo, cin * f_in, cout * f_out), w.dtype)
    for bwo, s_in, dw, t in entries:
        K = K.at[:, bwo - lo, s_in * cin:(s_in + 1) * cin, t * cout:(t + 1) * cout].set(
            w[:, dw]
        )
    return K, (-lo, hi)


class FoldedConv(nn.Module):
    """Conv2d on packed input, parameter-compatible with ``nn.Conv(name="conv")``.

    Holds the LOGICAL kernel (k,k,c_in,c2); expands per call. No bias
    (matches the reference Conv, BN follows).
    """

    c_in: int
    c2: int
    k: int
    s: int
    f_in: int

    @nn.compact
    def __call__(self, xp: jax.Array) -> jax.Array:
        w = self.param("kernel", torch_default, (self.k, self.k, self.c_in, self.c2))
        K, (pl, pr) = expand_folded_kernel(w.astype(xp.dtype), self.f_in, self.s)
        pad_h = autopad(self.k)
        return jax.lax.conv_general_dilated(
            xp, K, (self.s, 1), ((pad_h, pad_h), (pl, pr)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class PackedBN(nn.Module):
    """BatchNorm over the logical channels of a packed tensor.

    Parameter/collection-compatible with ``nn.BatchNorm(name="bn")``:
    params ``scale``/``bias`` and batch_stats ``mean``/``var`` of shape (C,).
    Mirrors flax semantics: fp32 stats, biased variance, running update
    ``ra = m*ra + (1-m)*batch`` — with the ConvBN settings (momentum .97,
    eps 1e-3, reference torch_utils.py:570-572).
    """

    channels: int
    f: int
    momentum: float = 0.97
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, xp: jax.Array, train: bool = False) -> jax.Array:
        c, f = self.channels, self.f
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros, None, (c,))
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones, None, (c,))

        if train:
            # reduce the packed tensor over (B,H,W') FIRST, then fold the
            # tiny (f*C,) vector to (f,C) and sum slots: the former 5-D
            # (b,h,wp,f,c) reshape of the FULL tensor forced a c-minor-lane
            # relayout (the ~1 ms reshape copies in the round-4 per-op
            # table); reducing in the native packed layout is copy-free and
            # only reassociates the f32 sum.
            x32 = xp.astype(jnp.float32)
            b, h, wp, fc = xp.shape
            n = b * h * wp * f
            s1 = jnp.sum(x32, axis=(0, 1, 2)).reshape(f, c).sum(0)          # (C,)
            s2 = jnp.sum(jnp.square(x32), axis=(0, 1, 2)).reshape(f, c).sum(0)
            mean = s1 / n
            mean2 = s2 / n
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        mul = (scale * jax.lax.rsqrt(var + self.epsilon)).astype(xp.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.epsilon)).astype(xp.dtype)
        return xp * jnp.tile(mul, f) + jnp.tile(add, f)


class PackedConvBN(nn.Module):
    """Packed equivalent of :class:`~mga_yolo_tpu.models.layers.ConvBN`.

    Children are named ``conv``/``bn`` with the logical parameter shapes, so
    the param tree is byte-identical to ConvBN's.
    """

    c_in: int
    c2: int
    k: int = 1
    s: int = 1
    f_in: int = 1
    act: bool = True

    @nn.compact
    def __call__(self, xp: jax.Array, train: bool = False) -> jax.Array:
        y = FoldedConv(self.c_in, self.c2, self.k, self.s, self.f_in, name="conv")(xp)
        y = PackedBN(self.c2, self.f_in // self.s, name="bn")(y, train)
        return nn.silu(y) if self.act else y


class _FoldedConv1x1Sum(nn.Module):
    """Folded 1x1 conv over a VIRTUAL concatenation of packed parts.

    ``conv(concat_lanes(parts))`` = sum of per-part convs with the logical
    kernel ROW-sliced before expansion — the packed concat (a 5-D reshape
    shuffle) and its backward never materialize. Parameter-identical to
    ``FoldedConv(c_in, c2, 1, 1, f, name=...)`` on the concatenated input
    (same logical ``kernel`` (1,1,c_in,c2)). f32 partial sums, one cast —
    only f32 summation order differs (~1 ulp). Mirrors layers._Conv1x1Sum.
    """

    c_in: int
    c2: int
    f: int

    @nn.compact
    def __call__(self, parts: list[jax.Array]) -> jax.Array:
        w = self.param("kernel", torch_default, (1, 1, self.c_in, self.c2))
        off, acc = 0, None
        for p in parts:
            sz = p.shape[-1] // self.f
            # k=1/s=1 folded kernel is exactly block-diagonal (one 1x1 tap,
            # pl=pr=0), so the conv IS a matmul — einsum instead of
            # conv_general_dilated because conv's transpose rule feeds the
            # f32 (preferred_element_type) cotangent into a bf16 conv and
            # TypeErrors under grad; einsum's transpose re-einsums with the
            # same preferred dtype (proven by layers._Conv1x1Sum under the
            # bf16 train path). Zero blocks contribute exact f32 zeros.
            K, _ = expand_folded_kernel(
                w[:, :, off : off + sz, :].astype(p.dtype), self.f, 1
            )
            y = jnp.einsum(
                "bhwu,uv->bhwv", p, K[0, 0], preferred_element_type=jnp.float32
            )
            acc = y if acc is None else acc + y
            off += sz
        assert off == self.c_in, f"parts sum to {off}, kernel expects {self.c_in}"
        return acc.astype(parts[0].dtype)


class PackedConvBNSum(nn.Module):
    """Packed ``ConvBN(c2, 1, 1)`` over a virtual concatenation of packed
    parts (children named ``conv``/``bn`` — parameter tree identical to
    PackedConvBN / ConvBN)."""

    c_in: int
    c2: int
    f: int
    act: bool = True

    @nn.compact
    def __call__(self, parts: list[jax.Array], train: bool = False) -> jax.Array:
        y = _FoldedConv1x1Sum(self.c_in, self.c2, self.f, name="conv")(parts)
        y = PackedBN(self.c2, self.f, name="bn")(y, train)
        return nn.silu(y) if self.act else y


class PackedBottleneck(nn.Module):
    """Packed Bottleneck (param-compatible with layers.Bottleneck)."""

    c_in: int
    c2: int
    shortcut: bool = True
    e: float = 1.0
    f: int = 1
    k: tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, xp: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * self.e)
        y = PackedConvBN(self.c_in, c_, self.k[0], 1, self.f, name="cv1")(xp, train)
        y = PackedConvBN(c_, self.c2, self.k[1], 1, self.f, name="cv2")(y, train)
        return xp + y if self.shortcut and self.c_in == self.c2 else y


def _lane_select_matrix(f: int, c: int, off: int, sz: int, dtype) -> jax.Array:
    """(f*c, f*sz) 0/1 matrix selecting logical channels [off, off+sz) from a
    slot-major packed tensor. Each output column has exactly ONE 1, so the
    matmul is an exact copy (one f32 product of x*1, no summation error)."""
    import numpy as np

    m = np.zeros((f * c, f * sz), np.float32)
    for s in range(f):
        for j in range(sz):
            m[s * c + off + j, s * sz + j] = 1.0
    return jnp.asarray(m, dtype)


def _split_lanes(xp: jax.Array, f: int, sizes: list[int]) -> list[jax.Array]:
    """Split a packed tensor along logical channels (within each slot block).

    Two bit-exact implementations, selected by ``perf.packed_split`` (config
    key ``packed_split`` / bench env ``MGA_PACKED_SPLIT_IMPL``, read at trace
    time so one A/B process can compile both; default ``matmul``):
    ``matmul`` — per-part selection matmuls (single-1 columns, exact copy;
    backward is the transposed matmul); ``reshape`` — the former 5-D
    reshape+slice (forces a c-minor lane-relayout copy, ~1 ms entries in the
    round-4 per-op table; backward is pad-and-add).
    """
    b, h, wp, fc = xp.shape
    c = fc // f
    if perf.active().packed_split == "reshape":
        slots = xp.reshape(b, h, wp, f, c)
        outs, off = [], 0
        for sz in sizes:
            outs.append(slots[..., off:off + sz].reshape(b, h, wp, f * sz))
            off += sz
        return outs
    outs, off = [], 0
    for sz in sizes:
        sel = _lane_select_matrix(f, c, off, sz, xp.dtype)
        outs.append(
            jnp.einsum("bhwu,uv->bhwv", xp, sel, preferred_element_type=jnp.float32)
            .astype(xp.dtype)
        )
        off += sz
    return outs


class PackedC3(nn.Module):
    """Packed C3 (used by C3k2 when c3k=True), param-compatible with C3."""

    c_in: int
    c2: int
    n: int = 1
    shortcut: bool = True
    k: int = 3
    f: int = 1

    @nn.compact
    def __call__(self, xp: jax.Array, train: bool = False) -> jax.Array:
        c_ = int(self.c2 * 0.5)
        a = PackedConvBN(self.c_in, c_, 1, 1, self.f, name="cv1")(xp, train)
        for i in range(self.n):
            a = PackedBottleneck(c_, c_, self.shortcut, e=1.0, f=self.f,
                                 k=(self.k, self.k), name=f"m{i}")(a, train)
        b = PackedConvBN(self.c_in, c_, 1, 1, self.f, name="cv2")(xp, train)
        return PackedConvBNSum(2 * c_, self.c2, self.f, name="cv3")([a, b], train)


class PackedC3k2(nn.Module):
    """Packed C3k2 (param-compatible with layers.C3k2)."""

    c_in: int
    c2: int
    n: int = 1
    c3k: bool = False
    shortcut: bool = True
    f: int = 1

    @nn.compact
    def __call__(self, xp: jax.Array, train: bool = False) -> jax.Array:
        c = int(self.c2 * 0.5)
        y = PackedConvBN(self.c_in, 2 * c, 1, 1, self.f, name="cv1")(xp, train)
        ys = _split_lanes(y, self.f, [c, c])
        for i in range(self.n):
            if self.c3k:
                blk = PackedC3(c, c, 2, self.shortcut, k=3, f=self.f, name=f"m{i}")
            else:
                blk = PackedBottleneck(c, c, self.shortcut, e=0.5, f=self.f, name=f"m{i}")
            ys.append(blk(ys[-1], train))
        return PackedConvBNSum((2 + self.n) * c, self.c2, self.f, name="cv2")(ys, train)


class PackedC2f(nn.Module):
    """Packed equivalent of :class:`~mga_yolo_tpu.models.layers.C2f`."""

    c_in: int
    c2: int
    n: int = 1
    shortcut: bool = False
    f: int = 1

    @nn.compact
    def __call__(self, xp: jax.Array, train: bool = False) -> jax.Array:
        c = int(self.c2 * 0.5)
        y = PackedConvBN(self.c_in, 2 * c, 1, 1, self.f, name="cv1")(xp, train)
        ys = _split_lanes(y, self.f, [c, c])
        for i in range(self.n):
            ys.append(
                PackedBottleneck(c, c, self.shortcut, e=1.0, f=self.f, name=f"m{i}")(
                    ys[-1], train
                )
            )
        return PackedConvBNSum((2 + self.n) * c, self.c2, self.f, name="cv2")(ys, train)


def _pow2_f(c_out: int, max_f: int, target_lanes: int) -> int:
    return 1 << max(0, min(int(math.log2(max_f)),
                           int(math.log2(max(1, target_lanes // c_out)))))


def plan_packed_section(spec, max_f: int = 32, target_lanes: int = 128) -> dict[int, tuple[int, int]]:
    """Decide which graph nodes run lane-packed.

    Returns {node_index: (f_in, f_out)} covering maximal *regions* of
    sequential packable nodes — Conv (k=3, s in {1,2}, g=1), C2f, C3k2 —
    whose output channels are below ``target_lanes``. A region anchors its
    factor chain on its first node (f_out = pow2(target_lanes // c_out),
    capped at ``max_f``; stride-2 convs then halve f) and ends when f
    reaches 1 or an unpackable/multi-input node appears. This covers both
    the small-C backbone prefix (l0-l5 at n scale) and the P3 neck chain
    (C3k2 + downsample Conv at stride 8), where XLA's 128-lane padding
    costs 2-8x HBM traffic.

    ``target_lanes=128`` fills one lane tile per tensor; ``256`` packs twice
    as deep so C2f's half-width inner bottlenecks also land on >=128 lanes
    (measured slower: sublane padding of the narrower packed W dominates).
    """
    plan: dict[int, tuple[int, int]] = {}
    f: int | None = None
    for node in spec.nodes:
        sequential = node.inputs == (node.index - 1,) or node.inputs == (-1,)
        if not sequential:
            f = None
            continue
        if node.module == "Conv":
            k = node.args[1] if len(node.args) > 1 else 1
            s = node.args[2] if len(node.args) > 2 else 1
            if k != 3 or s not in (1, 2):
                f = None
                continue
            if f is None:
                f_out = _pow2_f(node.c_out, max_f, target_lanes)
                if f_out <= 1:
                    continue
                f_in = f_out * s
            else:
                f_in = f
                f_out = f_in // s
                if f_out < 1:
                    f = None
                    continue
            plan[node.index] = (f_in, f_out)
            f = f_out if f_out > 1 else None
        elif node.module in ("C2f", "C3k2"):
            if f is None:
                f = _pow2_f(node.c_out, max_f, target_lanes)
                if f <= 1:
                    f = None
                    continue
            plan[node.index] = (f, f)
        else:
            f = None
    return plan


def build_packed_node(node, plan: dict[int, tuple[int, int]], c_in: int,
                      remat: bool = False):
    """Instantiate the packed module for a planned node (same name as unpacked).

    ``remat=True`` wraps the block in ``nn.remat`` (static ``train`` at call
    position 2), mirroring models/yolo.py's unpacked blocks."""
    from mga_yolo_tpu.graph import layer_param_name

    def rc(cls):
        return nn.remat(cls, static_argnums=(2,)) if remat else cls

    f_in, _ = plan[node.index]
    name = layer_param_name(node)
    if node.module == "Conv":
        k = node.args[1] if len(node.args) > 1 else 1
        s = node.args[2] if len(node.args) > 2 else 1
        return rc(PackedConvBN)(c_in, node.c_out, k, s, f_in, name=name)
    if node.module == "C2f":
        shortcut = node.args[1] if len(node.args) > 1 else False
        return rc(PackedC2f)(c_in, node.c_out, n=node.repeats, shortcut=shortcut,
                             f=f_in, name=name)
    if node.module == "C3k2":
        c3k = node.args[1] if len(node.args) > 1 else False
        return rc(PackedC3k2)(c_in, node.c_out, n=node.repeats, c3k=bool(c3k),
                              f=f_in, name=name)
    raise ValueError(f"unpackable module {node.module!r}")
