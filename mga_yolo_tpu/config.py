"""Typed configuration for the whole framework.

Replaces the reference's three-tier config system (Ultralytics cfg engine +
training YAML + ``MGA_*`` env vars, SURVEY.md §5.6) with one explicit,
typed :class:`MGAConfig` threaded through the code — while still *accepting*
the same YAML keys for surface compatibility: the reference's hyperparameter
YAMLs (`/root/reference/configs/hyperparams/cbam_defaults.yaml`) and its
``MGA_*`` flag names load unchanged via :func:`load_config`.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Optional

import yaml

from mga_yolo_tpu.perf import PerfConfig


@dataclasses.dataclass
class MaskPipelineConfig:
    """Mask loading + pyramid downsampling (reference MGA_MASK_* / MGA_PROB_* flags)."""

    method: str = "skeleton_bresenham"  # nearest|area|maxpool|pyrdown|skeleton_bresenham|gaussian_maxpool
    bridge: bool = True                 # 3x3 morphological-close bridge
    thresh: float = 0.0                 # area-method threshold
    skeleton_strict: bool = False       # strict skeleton path
    prob_mode: bool = False             # probabilistic masks (MGA_PROB_MODE)
    prob_method: str = "area"           # area|avgpool|nearest
    prob_approach: str = "gumbel"       # gater mode: deterministic|gumbel|hard_st|bernoulli_detach
    save_aug_masks: bool = False        # debug dumps (MGA_SAVE_AUG_MASKS)
    save_max: int = 16


@dataclasses.dataclass
class AugmentConfig:
    """Geometric/photometric augmentation (reference cfg/default.yaml keys)."""

    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    flipud: float = 0.0
    fliplr: float = 0.5
    mosaic: float = 1.0
    mosaic_n: int = 4       # mosaic layout: 3 (1x3), 4 (2x2) or 9 (3x3) images
    mixup: float = 0.0
    cutmix: float = 0.0
    albumentations: float = 0.0  # pixel-transform adapter prob (needs the optional dep)
    close_mosaic: int = 10  # disable mosaic for last N epochs
    # run the per-pixel augmentation (warp/HSV/flip/mask pyramid) batched on
    # the accelerator instead of host cv2 (data/device_augment.py). Falls back
    # to the host path with a warning when the config needs host-only pieces
    # (mixup/cutmix/albumentations, strict-skeleton masks).
    on_device: bool = False


@dataclasses.dataclass
class DataConfig:
    data: str = ""                 # data YAML path
    imgsz: int = 640
    max_boxes: int = 64            # static GT padding per image
    workers: int = 8
    cache: "bool | str" = False   # False | True/"ram" (decoded RAM cache) | "disk" (.npy sidecars)
    rect: bool = False             # rectangular val batching (static ar buckets)
    fraction: float = 1.0
    single_cls: bool = False
    # resolved from the data YAML:
    dataset_root: Optional[str] = None
    masks_dir: Optional[str] = None


@dataclasses.dataclass
class SegCfg:
    bce_weight: float = 1.0
    dice_weight: float = 1.0
    scale_weights: tuple = (1.0, 1.0, 1.0)
    smooth: float = 1.0
    loss_lambda: float = 1.0
    enabled: bool = True
    use_unified_focal: bool = False
    ufl_lambda: float = 0.5
    ufl_delta: float = 0.6
    ufl_gamma: float = 0.5


@dataclasses.dataclass
class TrainConfig:
    model: str = "configs/models/yolov8_cbam.yaml"
    model_scale: str = "n"
    task: str = "mga"
    epochs: int = 100
    batch: int = 16
    nbs: int = 64                  # nominal batch size for grad accumulation
    optimizer: str = "auto"        # SGD|Adam|AdamW|auto
    lr0: float = 0.01
    lrf: float = 0.01
    momentum: float = 0.937
    weight_decay: float = 0.0005
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    cos_lr: bool = False
    multi_scale: bool = False  # bucketed multi-scale (0.75/1.0/1.25 x imgsz)
    box: float = 7.5
    cls: float = 0.5
    dfl: float = 1.5
    patience: int = 100
    seed: int = 0
    deterministic: bool = True
    amp: bool = True               # bfloat16 compute on TPU
    ema_decay: float = 0.9999
    ema_tau: int = 2000
    val: bool = True
    save: bool = True              # write best/last checkpoints (reference `save`)
    save_period: int = -1
    project: str = "runs"
    name: str = "train"
    exist_ok: bool = False
    resume: bool = False
    device: Optional[str] = None
    plots: bool = True
    # feature-map capture (reference MGA_SAVE_FM flags)
    # fused Pallas attention kernels: True / False / "auto" (auto = fused for
    # eval/predict/serve on TPU, XLA under grad — each mode's measured-fastest)
    use_pallas: "bool | str" = "auto"
    # folded-conv lane packing for the small-channel backbone prefix
    # (models/lanepack.py): True / False / "auto" (auto = on for TPU training,
    # where the 128-lane padding of C<128 NHWC tensors dominates the backward)
    lane_pack: "bool | str" = "auto"
    # gradient checkpointing of backbone/neck blocks: True / False / "auto"
    # ("auto" = off, the conservative default; explicit True shrinks live
    # activation memory — larger per-chip batches — at recompute cost)
    remat: "bool | str" = "auto"
    save_fm: bool = False
    save_layers: tuple = (23, 25, 27)
    save_fm_max: int = 4


@dataclasses.dataclass
class MGAConfig:
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    augment: AugmentConfig = dataclasses.field(default_factory=AugmentConfig)
    mask: MaskPipelineConfig = dataclasses.field(default_factory=MaskPipelineConfig)
    seg: SegCfg = dataclasses.field(default_factory=SegCfg)
    # trace-time implementation selectors (perf.py); flat YAML keys
    # kth_impl / dfl_bwd / vconcat_acc / vconcat_min_k / packed_split
    perf: PerfConfig = dataclasses.field(default_factory=PerfConfig)
    extra: dict = dataclasses.field(default_factory=dict)  # unconsumed keys, kept for forwarding

    @property
    def save_dir(self) -> Path:
        return Path(self.train.project) / self.train.name


# Mapping of reference MGA_* env-style YAML keys -> (section, field)
_MGA_KEY_MAP = {
    "MGA_PROB_MODE": ("mask", "prob_mode"),
    "MGA_PROB_APPROACH": ("mask", "prob_approach"),
    "MGA_MASK_METHOD": ("mask", "method"),
    "MGA_MASK_BRIDGE": ("mask", "bridge"),
    "MGA_MASK_THRESH": ("mask", "thresh"),
    "MGA_SKELETON_STRICT": ("mask", "skeleton_strict"),
    "MGA_MASK_PROB_METHOD": ("mask", "prob_method"),
    "MGA_SAVE_AUG_MASKS": ("mask", "save_aug_masks"),
    "MGA_SAVE_MAX": ("mask", "save_max"),
    "MGA_SAVE_FM": ("train", "save_fm"),
    "MGA_SAVE_LAYERS": ("train", "save_layers"),
    "MGA_SAVE_FM_MAX": ("train", "save_fm_max"),
}

_SEG_KEYS = {f.name for f in dataclasses.fields(SegCfg)}
_PERF_KEYS = {f.name for f in dataclasses.fields(PerfConfig)}
_AUG_KEYS = {f.name for f in dataclasses.fields(AugmentConfig)}
_TRAIN_KEYS = {f.name for f in dataclasses.fields(TrainConfig)}
_DATA_KEYS = {f.name for f in dataclasses.fields(DataConfig)}


def resolve_cache_mode(value) -> Optional[str]:
    """Normalize the ``cache`` config value to None / "ram" / "disk".

    Mirrors the reference surface (`external/ultralytics/.../data/base.py:131-134`:
    ``cache = True | False | None | "ram" | "disk"``; True means "ram").
    """
    if isinstance(value, str):
        low = value.lower()
        if low == "disk":
            return "disk"
        if low in {"ram", "1", "true", "yes", "on"}:
            return "ram"
        return None
    return "ram" if value else None


def _coerce(value: Any, target: Any) -> Any:
    """Best-effort coercion of YAML values to the dataclass field's type."""
    if isinstance(target, bool):
        if isinstance(value, str):
            return value.lower() in {"1", "true", "yes", "on"}
        return bool(value)
    if isinstance(target, tuple) and isinstance(value, (list, tuple)):
        return tuple(value)
    if isinstance(target, tuple) and isinstance(value, str):
        return tuple(int(x) for x in value.split(",") if x.strip())
    if isinstance(target, int) and not isinstance(value, bool) and value is not None:
        return int(value)
    if isinstance(target, float) and value is not None:
        return float(value)
    return value


def load_config(cfg: str | Path | dict | None = None, **overrides) -> MGAConfig:
    """Build an MGAConfig from a training YAML (reference schema) + kwargs.

    Accepts every key the reference hyperparameter YAMLs use — flat keys go to
    the matching section; ``MGA_*`` keys map through ``_MGA_KEY_MAP`` instead
    of being exported to ``os.environ`` (reference `mga_yolo/utils/env.py:44`).
    Unknown keys are preserved in ``cfg.extra``.
    """
    raw: dict[str, Any] = {}
    if cfg is not None:
        if isinstance(cfg, (str, Path)):
            with open(cfg) as f:
                raw = yaml.safe_load(f) or {}
        else:
            raw = dict(cfg)
    raw.update(overrides)

    out = MGAConfig()
    for key, value in raw.items():
        if key == "cache":
            # `cache: ram|disk|true|false` (reference default.yaml surface) —
            # normalized here rather than in _coerce so the string modes
            # don't leak into every other bool-defaulted field
            out.data.cache = resolve_cache_mode(value) or False
            continue
        if key in _MGA_KEY_MAP:
            section, field = _MGA_KEY_MAP[key]
            obj = getattr(out, section)
            setattr(obj, field, _coerce(value, getattr(obj, field)))
        elif key in _SEG_KEYS:
            setattr(out.seg, key, _coerce(value, getattr(out.seg, key)))
        elif key in _PERF_KEYS:
            setattr(out.perf, key, _coerce(value, getattr(out.perf, key)))
        elif key in _AUG_KEYS:
            setattr(out.augment, key, _coerce(value, getattr(out.augment, key)))
        elif key in _DATA_KEYS:
            setattr(out.data, key, _coerce(value, getattr(out.data, key)))
        elif key in _TRAIN_KEYS:
            setattr(out.train, key, _coerce(value, getattr(out.train, key)))
        else:
            out.extra[key] = value

    # resolve data YAML for dataset root / masks dir
    if out.data.data:
        p = Path(out.data.data)
        if p.exists():
            with open(p) as f:
                dy = yaml.safe_load(f) or {}
            out.data.dataset_root = dy.get("dataset") or dy.get("path")
            out.data.masks_dir = dy.get("masks_dir")
    return out


def det_loss_config(cfg: MGAConfig):
    from mga_yolo_tpu.losses.detection import DetLossConfig

    return DetLossConfig(box=cfg.train.box, cls=cfg.train.cls, dfl=cfg.train.dfl)


def seg_loss_config(cfg: MGAConfig):
    from mga_yolo_tpu.losses.segmentation import SegLossConfig

    return SegLossConfig(
        bce_weight=cfg.seg.bce_weight,
        dice_weight=cfg.seg.dice_weight,
        scale_weights=tuple(cfg.seg.scale_weights),
        smooth=cfg.seg.smooth,
        loss_lambda=cfg.seg.loss_lambda,
        enabled=cfg.seg.enabled,
        prob_mode=cfg.mask.prob_mode,
        use_unified_focal=cfg.seg.use_unified_focal,
        ufl_lambda=cfg.seg.ufl_lambda,
        ufl_delta=cfg.seg.ufl_delta,
        ufl_gamma=cfg.seg.ufl_gamma,
    )
