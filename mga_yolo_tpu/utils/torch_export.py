"""Torch-reference weight export: map this framework's variable tree into a
reference MGA-YOLO state_dict (the inverse of `utils/torch_import.py`).

This is the TPU-native answer to the reference's export surface
(`/root/reference/mga_yolo/external/ultralytics/examples/*` ONNX/TFLite
deployment apps, scoped out of the runtime per SURVEY.md §2.9): instead of
re-implementing ONNX emission, a trained TPU checkpoint exports losslessly
into the reference's own minimal checkpoint format
(`/root/reference/mga_yolo/model/checkpoint.py:19-46` — ``model_state_dict``
+ ``train_args['nc']``), from which the entire mature torch deployment
toolchain (ONNX, TFLite, TensorRT, OpenVINO exporters) is reachable.

Layout conventions translated (inverse of torch_import):
    flax HWIO conv kernel (kh, kw, I, O) -> torch Conv2d (O, I, kh, kw)
    flax linear (I, O)                   -> torch Linear (O, I)
    flax conv1d (k, I, O)                -> torch Conv1d (O, I, k)
    bn scale/bias (params)               -> BatchNorm weight/bias
    bn mean/var (batch_stats)            -> BatchNorm running_mean/var
                                            (+ num_batches_tracked = 0)

The DFL projection conv — analytic in this framework — is materialized as
the fixed ``arange`` weight the reference constructs at init
(`.../ultralytics/nn/modules/block.py` DFL), so strict torch loads succeed.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from mga_yolo_tpu.graph import GraphSpec


def _conv2d(k: np.ndarray) -> np.ndarray:
    return np.transpose(k, (3, 2, 0, 1))


def _emit_bn(out: Dict[str, np.ndarray], prefix: str, p: dict, s: dict | None) -> None:
    out[prefix + ".weight"] = np.asarray(p["scale"])
    out[prefix + ".bias"] = np.asarray(p["bias"])
    s = s or {}
    n = np.asarray(p["scale"]).shape[0]
    out[prefix + ".running_mean"] = np.asarray(s.get("mean", np.zeros(n, np.float32)))
    out[prefix + ".running_var"] = np.asarray(s.get("var", np.ones(n, np.float32)))
    out[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def _emit_convbn(out: Dict[str, np.ndarray], prefix: str, p: dict, s: dict | None) -> None:
    out[prefix + ".conv.weight"] = _conv2d(np.asarray(p["conv"]["kernel"]))
    _emit_bn(out, prefix + ".bn", p["bn"], (s or {}).get("bn"))


def _emit_generic(out: Dict[str, np.ndarray], prefix: str, p: dict, s: dict | None) -> None:
    """Recursive walk for Conv/C2f/C3k2/C3/SPPF/Bottleneck-style subtrees:
    ``cvN`` -> ``cvN.``, ``mN`` -> ``m.N.``, {conv, bn} pair -> ConvBN."""
    if "conv" in p and "bn" in p:
        _emit_convbn(out, prefix, p, s)
        return
    s = s or {}
    for k in p:
        sub_prefix = f"{prefix}.m.{k[1:]}" if k[0] == "m" and k[1:].isdigit() else f"{prefix}.{k}"
        _emit_generic(out, sub_prefix, p[k], s.get(k))


def _emit_mask_head(out, prefix: str, p: dict, s: dict | None) -> None:
    # flax: proj/kernel (no-bias 1x1), bn, head/{kernel,bias} — torch Sequential
    # proj = [Conv2d, BatchNorm2d, SiLU], head = Conv2d (reference mask_head.py)
    out[prefix + ".proj.0.weight"] = _conv2d(np.asarray(p["proj"]["kernel"]))
    _emit_bn(out, prefix + ".proj.1", p["bn"], (s or {}).get("bn"))
    out[prefix + ".head.weight"] = _conv2d(np.asarray(p["head"]["kernel"]))
    out[prefix + ".head.bias"] = np.asarray(p["head"]["bias"])


def _emit_cbam(out, prefix: str, p: dict) -> None:
    out[prefix + ".cam_mlp.0.weight"] = np.asarray(p["cam_fc1"]["kernel"]).T
    out[prefix + ".cam_mlp.0.bias"] = np.asarray(p["cam_fc1"]["bias"])
    out[prefix + ".cam_mlp.2.weight"] = np.asarray(p["cam_fc2"]["kernel"]).T
    out[prefix + ".cam_mlp.2.bias"] = np.asarray(p["cam_fc2"]["bias"])
    out[prefix + ".sam_conv.weight"] = _conv2d(np.asarray(p["sam_conv"]["kernel"]))
    out[prefix + ".beta"] = np.asarray(p["beta"], np.float32).reshape(())


def _emit_eca(out, prefix: str, p: dict) -> None:
    out[prefix + ".conv1d.weight"] = np.transpose(np.asarray(p["conv1d"]["kernel"]), (2, 1, 0))
    if "beta" in p:
        out[prefix + ".beta"] = np.asarray(p["beta"], np.float32).reshape(())


def _emit_spade(out, prefix: str, p: dict) -> None:
    out[prefix + ".shared.0.weight"] = _conv2d(np.asarray(p["shared"]["kernel"]))
    out[prefix + ".shared.0.bias"] = np.asarray(p["shared"]["bias"])
    for name in ("conv_gamma", "conv_beta"):
        out[f"{prefix}.{name}.weight"] = _conv2d(np.asarray(p[name]["kernel"]))
        out[f"{prefix}.{name}.bias"] = np.asarray(p[name]["bias"])


def _emit_detect(out, prefix: str, p: dict, s: dict | None, legacy: bool, reg_max: int) -> None:
    s = s or {}
    for key in sorted(p):
        if key.startswith("cv2_"):
            _l, j = key.split("_")[1], key.split("_")[2]
            tp = f"{prefix}.cv2.{_l}.{j}"
            if j == "2":  # plain conv with bias
                out[tp + ".weight"] = _conv2d(np.asarray(p[key]["kernel"]))
                out[tp + ".bias"] = np.asarray(p[key]["bias"])
            else:
                _emit_convbn(out, tp, p[key], s.get(key))
        elif key.startswith("cv3_"):
            parts = key.split("_")
            _l, tail = parts[1], parts[2]
            if tail == "2":
                tp = f"{prefix}.cv3.{_l}.2"
                out[tp + ".weight"] = _conv2d(np.asarray(p[key]["kernel"]))
                out[tp + ".bias"] = np.asarray(p[key]["bias"])
            elif legacy:
                _emit_convbn(out, f"{prefix}.cv3.{_l}.{tail}", p[key], s.get(key))
            else:
                # non-legacy: cv3_{l}_{i}dw (DWConv wrapping ConvBN under "dw")
                # -> cv3.{l}.{i}.0 ; cv3_{l}_{i}pw -> cv3.{l}.{i}.1
                i, kind = tail[:-2], tail[-2:]
                sub = "0" if kind == "dw" else "1"
                node = p[key]["dw"] if kind == "dw" else p[key]
                snode = (s.get(key) or {}).get("dw") if kind == "dw" else s.get(key)
                _emit_convbn(out, f"{prefix}.cv3.{_l}.{i}.{sub}", node, snode)
    # analytic DFL projection: reference block.py initializes
    # conv.weight = arange(reg_max).view(1, reg_max, 1, 1)
    out[prefix + ".dfl.conv.weight"] = (
        np.arange(reg_max, dtype=np.float32).reshape(1, reg_max, 1, 1)
    )


def export_torch_state_dict(
    variables: Dict[str, Any], spec: GraphSpec, reg_max: int = 16
) -> Dict[str, np.ndarray]:
    """Convert a variable tree -> reference-keyed state_dict of numpy arrays.

    ``variables`` is the {'params', 'batch_stats'} tree (EMA or raw); the
    ``mtl_log_vars`` training head is not part of the torch model module list
    and is skipped.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for layer_name, p in params.items():
        if layer_name == "mtl_log_vars":
            continue
        idx_str, _, module = layer_name[1:].partition("_")
        prefix = f"model.{idx_str}"
        s = stats.get(layer_name)
        if module == "Detect":
            _emit_detect(out, prefix, p, s, spec.legacy_detect, reg_max)
        elif module == "MGAMaskHead":
            _emit_mask_head(out, prefix, p, s)
        elif module == "MaskCBAM":
            _emit_cbam(out, prefix, p)
        elif module == "MaskECA":
            _emit_eca(out, prefix, p)
        elif module == "MaskSPADE":
            _emit_spade(out, prefix, p)
        else:
            _emit_generic(out, prefix, p, s)
    return {k: np.ascontiguousarray(np.asarray(v, np.float32) if v.dtype != np.int64 else v)
            for k, v in out.items()}


def save_reference_checkpoint(
    variables: Dict[str, Any],
    spec: GraphSpec,
    path,
    nc: int,
    model_yaml: str | None = None,
    is_ema: bool = False,
) -> None:
    """Write the reference's minimal checkpoint format (torch.save dict with
    ``model_state_dict``/``ema_state_dict`` + ``train_args``), loadable by
    `/root/reference/mga_yolo/model/checkpoint.py:19`
    ``rebuild_mga_model_from_minimal_ckpt``."""
    import torch

    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in export_torch_state_dict(variables, spec).items()
    }
    key = "ema_state_dict" if is_ema else "model_state_dict"
    ckpt = {key: sd, "train_args": {"nc": int(nc)}}
    if model_yaml:
        ckpt["train_args"]["model"] = str(model_yaml)
    torch.save(ckpt, str(path))
