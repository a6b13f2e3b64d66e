"""MGAModel — the full detection+segmentation graph as one Flax module.

TPU-first inversion of the reference design: instead of a graph walk with
forward hooks and capture-by-index (`/root/reference/mga_yolo/model/model.py:46-87`
``MGAModel._predict_once``), the forward pass simply *returns* everything —
``{"det": [...], "seg": {"p3": ..}, "taps": {...}}`` — since in JAX the
trace is functional and intermediate taps come for free.

The module is built from a static :class:`~mga_yolo_tpu.graph.GraphSpec`
(parsed from the same YAML schema as the reference, see
``configs/models/yolov8_cbam.yaml``), keeps all shapes static, and traces
once under ``jit``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mga_yolo_tpu.graph import GraphSpec, NodeSpec, layer_param_name
from mga_yolo_tpu.models import layers as L
from mga_yolo_tpu.models.attention import MaskCBAM, MaskECA, MaskSPADE
from mga_yolo_tpu.models.heads import Detect, MGAMaskHead


def compute_strides(spec: GraphSpec) -> dict[int, int]:
    """Static per-node cumulative stride (input = 1).

    Replaces the reference's dummy-forward stride probe
    (`nn/tasks.py:417-434`) with pure graph analysis: Conv/DWConv multiply the
    stride by their ``s`` arg, Upsample divides by its scale factor, everything
    else passes through (multi-input nodes take their first input's stride).
    """
    strides: dict[int, int] = {}

    def in_stride(node: NodeSpec) -> int:
        f = node.inputs[0]
        return 1 if f < 0 else strides[f]

    for node in spec.nodes:
        s = in_stride(node)
        if node.module in ("Conv", "DWConv"):
            conv_s = node.args[2] if len(node.args) > 2 else 1
            s *= int(conv_s)
        elif node.module == "Upsample":
            factor = node.args[1] if len(node.args) > 1 else 2
            s = max(1, s // int(factor))
        strides[node.index] = s
    return strides


def build_node(node: NodeSpec, spec: GraphSpec, strides: dict[int, int], use_pallas: bool = False,
               remat: bool = False) -> Optional[nn.Module]:
    """Instantiate the Flax module for one graph node (None for inline ops).

    ``remat=True`` wraps the heavy single-input blocks (Conv/C2f/C3/C3k2/SPPF)
    in ``nn.remat`` (gradient checkpointing): the backward recomputes the
    block's activations instead of reading them back from HBM — a FLOPs-for-
    bandwidth trade aimed at the bandwidth-bound train backward (param names
    are unchanged by the lifted transform, so checkpoints are compatible).
    """
    m, a = node.module, node.args
    name = layer_param_name(node)

    def rc(cls):
        # static_argnums counts self at 0, so (x, train) puts train at 2
        return nn.remat(cls, static_argnums=(2,)) if remat else cls

    if m == "Conv":
        c2 = a[0]
        k = a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        return rc(L.ConvBN)(c2, k, s, name=name)
    if m == "DWConv":
        c2 = a[0]
        k = a[1] if len(a) > 1 else 1
        s = a[2] if len(a) > 2 else 1
        return rc(L.DWConv)(c2, k, s, name=name)
    if m == "C2f":
        shortcut = a[1] if len(a) > 1 else False
        return rc(L.C2f)(a[0], n=node.repeats, shortcut=shortcut, name=name)
    if m == "C3":
        shortcut = a[1] if len(a) > 1 else True
        return rc(L.C3)(a[0], n=node.repeats, shortcut=shortcut, name=name)
    if m == "C3k2":
        c3k = a[1] if len(a) > 1 else False
        return rc(L.C3k2)(a[0], n=node.repeats, c3k=bool(c3k), name=name)
    if m == "SPPF":
        k = a[1] if len(a) > 1 else 5
        return rc(L.SPPF)(a[0], k=k, name=name)
    if m == "MGAMaskHead":
        return MGAMaskHead(hidden=a[0], out_ch=a[1] if len(a) > 1 else 1, name=name)
    if m == "MaskCBAM":
        return MaskCBAM(channels=a[0], use_pallas=use_pallas, name=name)
    if m == "MaskECA":
        return MaskECA(channels=a[0], use_pallas=use_pallas, name=name)
    if m == "MaskSPADE":
        return MaskSPADE(channels=a[0], name=name)
    if m == "Detect":
        ch = tuple(a[1])
        det_strides = tuple(strides[i] for i in node.inputs)
        return Detect(
            nc=spec.nc, ch=ch, strides=det_strides, legacy=spec.legacy_detect, name=name
        )
    if m in ("Upsample", "Concat"):
        return None  # inline ops
    raise ValueError(f"No builder for module {m!r}")


class MGAModel(nn.Module):
    """Graph-walking forward that returns det maps, seg logits, and taps.

    Output dict:
        det: train -> list of 3 raw NHWC maps (B,H/s,W/s, 4*reg_max+nc);
             eval  -> (decoded (B,A,4+nc), raw maps)
        seg: {"p3"|"p4"|"p5": (B,H/s,W/s,1) mask logits}
        taps: optional {layer_index: feature} when ``tap_indices`` given —
              functional replacement for the reference's forward hooks
              (`mga_yolo/model/validator.py:186-257`).
    """

    spec: GraphSpec
    tap_indices: tuple[int, ...] = ()
    use_pallas: bool = False  # fused Pallas kernels in attention blocks (TPU)
    lane_pack: bool = False   # folded-conv lane packing for small-C layers (TPU)
    lane_pack_lanes: int = 128  # packing target: lanes per packed tensor (128/256)
    # "all" packs every eligible region (backbone prefix + P3 neck chain);
    # "prefix" restricts to the leading backbone chain — the measured-fastest
    # setting (interleaved A/B b128@640: prefix 109.1 / all 115.3 / off
    # 121.9 ms per step, bench_ab_train.py, BASELINE.md r3) and what
    # create_model's "auto" resolves to.
    lane_pack_regions: str = "prefix"
    # gradient checkpointing of backbone/neck blocks (nn.remat): recompute
    # block activations in the backward instead of round-tripping them
    # through HBM — a lever for the bandwidth-bound train backward and for
    # fitting larger per-chip batches (b256 @640 OOMs without it)
    remat: bool = False

    def setup(self):
        strides = compute_strides(self.spec)
        self._strides = strides
        if self.lane_pack:
            from mga_yolo_tpu.models.lanepack import build_packed_node, plan_packed_section

            plan = plan_packed_section(self.spec, target_lanes=self.lane_pack_lanes)
            if self.lane_pack_regions == "prefix":
                keep, i = {}, min(plan) if plan else 0
                while i in plan:
                    keep[i] = plan[i]
                    i += 1
                plan = keep
            self._pack_plan = plan
        else:
            self._pack_plan = {}
        mods = {}
        for node in self.spec.nodes:
            if node.index in self._pack_plan:
                from mga_yolo_tpu.models.lanepack import build_packed_node

                mods[node.index] = build_packed_node(
                    node, self._pack_plan, node.c_in, remat=self.remat
                )
                continue
            mod = build_node(node, self.spec, strides, self.use_pallas, remat=self.remat)
            if mod is not None:
                mods[node.index] = mod
        self.blocks = mods
        det_node = self.spec.nodes[self.spec.detect_index]
        self.det_strides = tuple(strides[i] for i in det_node.inputs)

    def __call__(self, x: jax.Array, train: bool = False) -> dict[str, Any]:
        spec = self.spec
        save = set(spec.save)
        cache: dict[int, jax.Array] = {}
        seg: dict[str, jax.Array] = {}
        taps: dict[int, jax.Array] = {}
        prev: Any = x
        det_out = None

        plan = self._pack_plan
        if plan:
            from mga_yolo_tpu.models.lanepack import pack_width, unpack_width

        def mat(v):
            """Materialize a lazily-deferred Concat (list of parts)."""
            return jnp.concatenate(v, axis=-1) if isinstance(v, list) else v
        # (value, f) of the previous node's packed output when it ran packed;
        # packed regions chain through this, everyone else consumes the
        # unpacked `prev`/cache (XLA dead-code-eliminates unused unpacks)
        packed_prev = None

        for node in spec.nodes:
            if node.index in plan:
                f_in, f_out = plan[node.index]
                src = node.inputs[0]
                # chain through the packed value only when the previous
                # node's packing factor matches this node's expected f_in
                # (two adjacent regions with different factors must relayout)
                if packed_prev is not None and src == node.index - 1 and packed_prev[1] == f_in:
                    xin = packed_prev[0]
                else:  # region entry: one relayout into the packed layout
                    base = x if src < 0 else (prev if src == node.index - 1 else cache[src])
                    xin = pack_width(mat(base), f_in)
                # positional `train`: nn.remat's static_argnums sees index 2
                out_p = self.blocks[node.index](xin, train)
                packed_prev = (out_p, f_out)
                out = unpack_width(out_p, f_out)
                if node.index in self.tap_indices:
                    taps[node.index] = out
                if node.index in save:
                    cache[node.index] = out
                prev = out
                continue
            packed_prev = None
            ins = []
            for f in node.inputs:
                if f == node.index - 1:
                    ins.append(prev)
                elif f < 0:
                    ins.append(x)
                else:
                    ins.append(cache[f])

            m = node.module

            # Concat nodes are LAZY (a python list of parts): C2f/C3k2 open
            # with a 1x1 conv, which consumes parts directly as a sum of
            # row-sliced convs (layers.ConvBNSum) — the neck concats and
            # their backward slices never materialize. Every other consumer
            # gets the materialized tensor (mat(), defined above).
            if m == "Upsample":
                out = L.upsample2x(mat(ins[0]))
            elif m == "Concat":
                # lazy (list) only under train, where the backward slice/pad
                # savings pay; eval materializes (bench.py −28% otherwise)
                out = [mat(v) for v in ins] if train else jnp.concatenate(
                    [mat(v) for v in ins], axis=-1
                )
            elif m in ("MaskCBAM", "MaskECA", "MaskSPADE"):
                feat, mask = ins
                out = self.blocks[node.index](mat(feat), mat(mask), train=train)
            elif m == "Detect":
                out = self.blocks[node.index]([mat(v) for v in ins], train=train)
                det_out = out
            elif m in ("C2f", "C3k2"):
                out = self.blocks[node.index](ins[0], train)  # list-aware
            else:
                out = self.blocks[node.index](mat(ins[0]), train)

            if isinstance(out, list) and node.index in self.tap_indices:
                out = mat(out)  # taps API returns tensors

            if m == "MGAMaskHead" and node.scale_name:
                seg[node.scale_name] = out
            if node.index in self.tap_indices:
                taps[node.index] = out
            if node.index in save:
                cache[node.index] = out
            prev = out

        result = {"det": det_out, "seg": seg}
        if self.tap_indices:
            result["taps"] = taps
        return result


def resolve_use_pallas(mode: bool | str | None, *, training: bool) -> bool:
    """Mode-aware resolution of the fused-Pallas-attention flag.

    ``"auto"`` (the shipped default) picks the measured-fastest implementation
    per execution mode on this hardware: fused kernels for eval/predict/serve
    on TPU (1.74x, bit-exact vs XLA), plain XLA under grad (the fused VJP was
    measured *slower* than XLA's fusion for training). Explicit True/False
    always wins. North star: "the attention blocks become fused Pallas
    kernels" (BASELINE.json) — this makes the fast path the default user path
    rather than a bench-only flag.
    """
    if isinstance(mode, bool):
        return mode
    if isinstance(mode, int):  # YAML `use_pallas: 1` parses as int, not bool
        return mode > 0
    if isinstance(mode, str) and mode.lower() in {"1", "true", "yes", "on"}:
        return True
    if isinstance(mode, str) and mode.lower() in {"0", "false", "no", "off"}:
        return False
    # "auto" / None
    if training:
        return False
    try:
        on_tpu = jax.default_backend() == "tpu"
    except RuntimeError:
        on_tpu = False
    return on_tpu


def resolve_lane_pack(mode: bool | str | int | None, *, training: bool) -> tuple[bool, int]:
    """Mode-aware resolution of the lane-packing flag (models/lanepack.py).

    Returns (enabled, target_lanes). ``"auto"`` resolves to **off** since
    round 4: the lazy-concat / virtual-concat-1x1 rewrite (layers.ConvBNSum)
    plus the fused DFL VJP made the PLAIN path the fastest measured train
    configuration (interleaved same-process A/B @ b128 640 bf16: plain
    98.6 ms / 1298 img/s vs lanepack-prefix 102.4 ms / 1250 — BASELINE.md
    round 4; in round 3, before lazy-concat, prefix had won 109 vs 122 ms).
    Lane packing remains an explicit lever (``lane_pack: 128``/``256``,
    regions via ``lane_pack_regions``) because the folded-conv machinery is
    still the right tool when the lane-starved region grows (wider inputs,
    smaller imgsz). An int (128/256) forces that packing depth on.
    """
    if isinstance(mode, bool):
        return mode, 128
    if isinstance(mode, int):
        return mode > 0, max(mode, 128)
    if isinstance(mode, str):
        low = mode.lower()
        if low in {"1", "true", "yes", "on"}:
            return True, 128
        if low in {"0", "false", "no", "off"}:
            return False, 128
        if low.isdigit():
            return int(low) > 0, max(int(low), 128)
    # "auto" / None: off in every mode since round 4 (see docstring)
    return False, 128


def resolve_remat(mode: bool | str | int | None, *, training: bool) -> bool:
    """Mode-aware resolution of the gradient-checkpointing flag.

    ``"auto"`` currently resolves to False everywhere — the conservative
    default until the rematted backward is measured faster on hardware
    (BASELINE.md records the A/B). The explicit lever exists because remat
    shrinks live activation memory (larger per-chip batches, e.g. b256 @640
    OOMs without it) and trades recompute FLOPs for HBM bandwidth, which can
    win when the backward is bandwidth-bound. Remat is meaningless outside
    training (no backward), so ``training=False`` always resolves False;
    unrecognized strings raise instead of silently disabling.
    """
    if not training:
        return False  # no backward pass -> nothing to checkpoint
    if isinstance(mode, bool):
        return mode
    if isinstance(mode, int):
        return mode > 0
    if isinstance(mode, str):
        low = mode.lower()
        if low in {"1", "true", "yes", "on"}:
            return True
        if low in {"0", "false", "no", "off"}:
            return False
        if low != "auto":
            raise ValueError(f"remat: expected true/false/auto, got {mode!r}")
    return False


def create_model(
    cfg: str | dict,
    scale: str | None = None,
    nc: int | None = None,
    tap_indices=(),
    use_pallas: bool | str | None = False,
    lane_pack: bool | str | None = False,
    lane_pack_regions: str = "auto",
    remat: bool | str | None = False,
    training: bool = True,
) -> tuple[MGAModel, GraphSpec]:
    """Parse YAML + build the model in one call. ``use_pallas`` and
    ``lane_pack`` accept True/False/"auto" (see the resolvers above).

    ``lane_pack_regions="auto"`` resolves to "prefix" (pack only the leading
    small-C backbone chain): the interleaved same-process A/B at b128@640
    bf16 on v5e measured prefix 109.1 ms / all 115.3 ms / unpacked 121.9 ms
    per train step (tools/scripts/bench_ab_train.py, BASELINE.md r3) — the
    P3-neck packed region costs more in fold-FLOP inflation than its lane
    win. Pass "all" to also pack the neck chain.
    """
    from mga_yolo_tpu.graph import parse_graph

    spec = parse_graph(cfg, scale=scale, nc=nc)
    flag = resolve_use_pallas(use_pallas, training=training)
    pack, lanes = resolve_lane_pack(lane_pack, training=training)
    regions = lane_pack_regions
    if regions == "auto":
        regions = "prefix"
    return MGAModel(spec=spec, tap_indices=tuple(tap_indices), use_pallas=flag,
                    lane_pack=pack, lane_pack_lanes=lanes,
                    lane_pack_regions=regions,
                    remat=resolve_remat(remat, training=training)), spec
