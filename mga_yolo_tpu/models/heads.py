"""Detection and mask heads.

* :class:`Detect` — anchor-free DFL detection head, re-implementing the
  reference (`/root/reference/mga_yolo/external/ultralytics/ultralytics/nn/modules/head.py:24-228`)
  in NHWC.  Train mode returns the raw per-level maps (box_dist ++ cls); eval
  mode additionally DFL-decodes to xywh·stride (head.py:150-186).
* :class:`MGAMaskHead` — per-scale coarse segmentation head
  (`/root/reference/mga_yolo/nn/modules/segmentation.py:56-131`):
  Conv1x1(in->hidden) -> BN -> SiLU -> Conv3x3(hidden->out logits), Kaiming
  (fan_out) init, zero biases, no upsampling.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mga_yolo_tpu.models.layers import ConvBN, DWConv, kaiming_out, torch_default
from mga_yolo_tpu.ops.boxes import dist2bbox, make_anchors


class MGAMaskHead(nn.Module):
    """Lightweight coarse mask head producing logits at feature resolution."""

    hidden: int
    out_ch: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        y = nn.Conv(
            self.hidden, (1, 1), use_bias=False, kernel_init=kaiming_out, name="proj"
        )(x)
        # BN eps/momentum follow the reference initialize_weights (1e-3, 0.03)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3, name="bn")(y)
        y = nn.silu(y)
        if self.dropout > 0 and train:
            y = nn.Dropout(rate=self.dropout, deterministic=not train)(y)
        return nn.Conv(
            self.out_ch,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=True,
            kernel_init=kaiming_out,
            bias_init=nn.initializers.zeros,
            name="head",
        )(y)


class DFL(nn.Module):
    """Distribution Focal Loss expectation decode (reference block.py:58).

    Input: (B, A, 4*reg_max) raw distances. Output: (B, A, 4) expected ltrb.
    """

    reg_max: int = 16

    def __call__(self, x: jax.Array) -> jax.Array:
        b, a, _ = x.shape
        x = x.reshape(b, a, 4, self.reg_max)
        proj = jnp.arange(self.reg_max, dtype=x.dtype)
        return (jax.nn.softmax(x, axis=-1) * proj).sum(-1)


class Detect(nn.Module):
    """YOLOv8/11 anchor-free detection head (NHWC).

    Attributes:
        nc: number of classes.
        ch: per-level input channels.
        strides: per-level strides (needed for bias init + eval decode).
        legacy: True -> v8-style cls branch; False -> YOLO11 DWConv cls branch
            (the MGA graphs use C3k2 so the reference sets legacy=False,
            nn/tasks.py:1700).
    """

    nc: int
    ch: tuple[int, ...]
    strides: tuple[int, ...]
    legacy: bool = False
    reg_max: int = 16

    def _box_branch(self, x: jax.Array, c2: int, lvl: int, train: bool) -> jax.Array:
        y = ConvBN(c2, 3, name=f"cv2_{lvl}_0")(x, train)
        y = ConvBN(c2, 3, name=f"cv2_{lvl}_1")(y, train)
        return nn.Conv(
            4 * self.reg_max,
            (1, 1),
            use_bias=True,
            kernel_init=torch_default,
            bias_init=nn.initializers.constant(1.0),  # reference bias_init head.py:187
            name=f"cv2_{lvl}_2",
        )(y)

    def _cls_branch(self, x: jax.Array, c3: int, lvl: int, train: bool) -> jax.Array:
        if self.legacy:
            y = ConvBN(c3, 3, name=f"cv3_{lvl}_0")(x, train)
            y = ConvBN(c3, 3, name=f"cv3_{lvl}_1")(y, train)
        else:
            c1 = x.shape[-1]
            y = DWConv(c1, 3, name=f"cv3_{lvl}_0dw")(x, train)
            y = ConvBN(c3, 1, name=f"cv3_{lvl}_0pw")(y, train)
            y = DWConv(c3, 3, name=f"cv3_{lvl}_1dw")(y, train)
            y = ConvBN(c3, 1, name=f"cv3_{lvl}_1pw")(y, train)
        s = self.strides[lvl]
        cls_bias = math.log(5 / self.nc / (640 / s) ** 2)
        return nn.Conv(
            self.nc,
            (1, 1),
            use_bias=True,
            kernel_init=torch_default,
            bias_init=nn.initializers.constant(cls_bias),
            name=f"cv3_{lvl}_2",
        )(y)

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        c2 = max(16, self.ch[0] // 4, self.reg_max * 4)
        c3 = max(self.ch[0], min(self.nc, 100))
        maps = []
        for i, x in enumerate(xs):
            box = self._box_branch(x, c2, i, train)
            cls = self._cls_branch(x, c3, i, train)
            maps.append(jnp.concatenate([box, cls], axis=-1))  # (B,H,W,4*reg_max+nc)
        if train:
            return maps
        return self.decode(maps), maps

    def decode(self, maps: Sequence[jax.Array]) -> jax.Array:
        """Eval-path decode: (B, A, 4+nc) with xywh in input-image pixels."""
        b = maps[0].shape[0]
        no = 4 * self.reg_max + self.nc
        flat = jnp.concatenate([m.reshape(b, -1, no) for m in maps], axis=1)
        box, cls = flat[..., : 4 * self.reg_max], flat[..., 4 * self.reg_max :]
        shapes = [(m.shape[1], m.shape[2]) for m in maps]
        anchors, stride_t = make_anchors(shapes, self.strides, 0.5, dtype=flat.dtype)
        ltrb = DFL(self.reg_max)(box)
        dbox = dist2bbox(ltrb, anchors[None], xywh=True) * stride_t[None]
        return jnp.concatenate([dbox, jax.nn.sigmoid(cls)], axis=-1)
