"""Torch-reference weight import: map a reference MGA-YOLO state_dict into
this framework's variable tree.

Enables (a) migrating checkpoints trained with the torch reference
(`/root/reference/mga_yolo/model/checkpoint.py` minimal format or raw
state_dicts) onto TPU, and (b) bit-level forward parity testing between the
two frameworks (BASELINE.json north star: "bit-comparable attention maps").

Layout conventions translated:
    torch Conv2d weight (O, I, kh, kw)  -> flax HWIO (kh, kw, I, O)
    torch Linear weight (O, I)          -> flax (I, O)
    torch Conv1d weight (O, I, k)       -> flax (k, I, O)
    BatchNorm weight/bias               -> bn scale/bias (params)
    BatchNorm running_mean/var          -> batch_stats mean/var
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from mga_yolo_tpu.graph import GraphSpec


def _set(tree: dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _convbn_paths(rest: str) -> list[tuple[tuple[str, ...], str, bool]]:
    """Map 'conv.weight'/'bn.*' suffixes of a ConvBN. Returns
    [(path, kind, is_stats)] where kind in {conv2d, raw}."""
    out = []
    if rest == "conv.weight":
        out.append((("conv", "kernel"), "conv2d", False))
    elif rest == "bn.weight":
        out.append((("bn", "scale"), "raw", False))
    elif rest == "bn.bias":
        out.append((("bn", "bias"), "raw", False))
    elif rest == "bn.running_mean":
        out.append((("bn", "mean"), "raw", True))
    elif rest == "bn.running_var":
        out.append((("bn", "var"), "raw", True))
    return out


def _map_inner(rest: str) -> list[tuple[tuple[str, ...], str, bool]]:
    """Map one torch parameter suffix (inside a layer) to flax path(s)."""
    # bottleneck lists: m.3.cv1.conv.weight -> m3/cv1/...
    m = re.match(r"^m\.(\d+)\.(.*)$", rest)
    if m:
        sub = _map_inner(m.group(2))
        return [((f"m{m.group(1)}",) + p, k, s) for p, k, s in sub]
    # nested ConvBN: cv1.conv.weight / cv2.bn.bias ...
    m = re.match(r"^(cv\d+)\.(.*)$", rest)
    if m:
        sub = _convbn_paths(m.group(2))
        if sub:
            return [((m.group(1),) + p, k, s) for p, k, s in sub]
        sub = _map_inner(m.group(2))
        return [((m.group(1),) + p, k, s) for p, k, s in sub]
    # plain ConvBN at this level
    sub = _convbn_paths(rest)
    if sub:
        return sub
    # MGAMaskHead: proj.0 conv, proj.1 bn, head conv(+bias)
    if rest == "proj.0.weight":
        return [(("proj", "kernel"), "conv2d", False)]
    if rest == "proj.1.weight":
        return [(("bn", "scale"), "raw", False)]
    if rest == "proj.1.bias":
        return [(("bn", "bias"), "raw", False)]
    if rest == "proj.1.running_mean":
        return [(("bn", "mean"), "raw", True)]
    if rest == "proj.1.running_var":
        return [(("bn", "var"), "raw", True)]
    if rest == "head.weight":
        return [(("head", "kernel"), "conv2d", False)]
    if rest == "head.bias":
        return [(("head", "bias"), "raw", False)]
    # MaskCBAM
    if rest == "cam_mlp.0.weight":
        return [(("cam_fc1", "kernel"), "linear", False)]
    if rest == "cam_mlp.0.bias":
        return [(("cam_fc1", "bias"), "raw", False)]
    if rest == "cam_mlp.2.weight":
        return [(("cam_fc2", "kernel"), "linear", False)]
    if rest == "cam_mlp.2.bias":
        return [(("cam_fc2", "bias"), "raw", False)]
    if rest == "sam_conv.weight":
        return [(("sam_conv", "kernel"), "conv2d", False)]
    if rest == "beta":
        return [(("beta",), "scalar", False)]
    # MaskECA
    if rest == "conv1d.weight":
        return [(("conv1d", "kernel"), "conv1d", False)]
    # MaskSPADE
    if rest == "shared.0.weight":
        return [(("shared", "kernel"), "conv2d", False)]
    if rest == "shared.0.bias":
        return [(("shared", "bias"), "raw", False)]
    if rest == "conv_gamma.weight":
        return [(("conv_gamma", "kernel"), "conv2d", False)]
    if rest == "conv_gamma.bias":
        return [(("conv_gamma", "bias"), "raw", False)]
    if rest == "conv_beta.weight":
        return [(("conv_beta", "kernel"), "conv2d", False)]
    if rest == "conv_beta.bias":
        return [(("conv_beta", "bias"), "raw", False)]
    return []


def _map_detect(rest: str, legacy: bool) -> list[tuple[tuple[str, ...], str, bool]]:
    """Detect head: cv2.{l}.{j} box branch, cv3.{l}.{...} cls branch."""
    m = re.match(r"^cv2\.(\d+)\.(\d+)\.(.*)$", rest)
    if m:
        l, j, r = m.group(1), int(m.group(2)), m.group(3)
        if j < 2:
            sub = _convbn_paths(r)
            return [((f"cv2_{l}_{j}",) + p, k, s) for p, k, s in sub]
        if r == "weight":
            return [((f"cv2_{l}_2", "kernel"), "conv2d", False)]
        if r == "bias":
            return [((f"cv2_{l}_2", "bias"), "raw", False)]
    m = re.match(r"^cv3\.(\d+)\.(.*)$", rest)
    if m:
        l, r = m.group(1), m.group(2)
        if legacy:
            mm = re.match(r"^(\d+)\.(.*)$", r)
            if mm and int(mm.group(1)) < 2:
                sub = _convbn_paths(mm.group(2))
                return [((f"cv3_{l}_{mm.group(1)}",) + p, k, s) for p, k, s in sub]
        else:
            # cv3.{l}.0.0.* dwconv, cv3.{l}.0.1.* pwconv, .1.0, .1.1, .2
            mm = re.match(r"^([01])\.([01])\.(.*)$", r)
            if mm:
                idx, sub_idx, rr = mm.group(1), mm.group(2), mm.group(3)
                name = f"cv3_{l}_{idx}" + ("dw" if sub_idx == "0" else "pw")
                sub = _convbn_paths(rr)
                # DWConv wraps its ConvBN in a submodule named "dw"
                prefix = (name, "dw") if sub_idx == "0" else (name,)
                return [(prefix + p, k, s) for p, k, s in sub]
        mm = re.match(r"^2\.(.*)$", r)
        if mm:
            if mm.group(1) == "weight":
                return [((f"cv3_{l}_2", "kernel"), "conv2d", False)]
            if mm.group(1) == "bias":
                return [((f"cv3_{l}_2", "bias"), "raw", False)]
    return []


def import_torch_state_dict(
    state_dict: Dict[str, Any], spec: GraphSpec
) -> tuple[dict, dict, list[str]]:
    """Convert a torch reference state_dict -> (params, batch_stats, skipped).

    Keys look like ``model.{i}.{rest}`` (DetectionModel module list). The DFL
    projection conv (fixed arange weights, reference block.py:58) is computed
    analytically here and skipped.
    """
    params: dict = {}
    stats: dict = {}
    skipped: list[str] = []
    node_by_idx = {n.index: n for n in spec.nodes}

    for key, value in state_dict.items():
        v = value.detach().cpu().numpy() if hasattr(value, "detach") else np.asarray(value)
        m = re.match(r"^model\.(\d+)\.(.*)$", key)
        if not m:
            skipped.append(key)
            continue
        idx, rest = int(m.group(1)), m.group(2)
        node = node_by_idx.get(idx)
        if node is None:
            skipped.append(key)
            continue
        layer = f"l{idx}_{node.module}"
        if node.module == "Detect":
            if rest.startswith("dfl."):
                continue  # analytic in this framework
            maps = _map_detect(rest, spec.legacy_detect)
        else:
            maps = _map_inner(rest)
        if not maps:
            skipped.append(key)
            continue
        for path, kind, is_stats in maps:
            if kind == "conv2d":
                out = _conv2d(v)
            elif kind == "linear":
                out = v.T
            elif kind == "conv1d":
                out = np.transpose(v, (2, 1, 0))
            elif kind == "scalar":
                out = v.reshape(())
            else:
                out = v
            _set(stats if is_stats else params, (layer,) + path, out)
    return params, stats, skipped


def merge_imported(variables: dict, params: dict, stats: dict) -> dict:
    """Overlay imported tensors onto an initialized variable tree (shape-checked)."""
    import jax

    def overlay(dst, src, where=""):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                out[k] = overlay(dst.get(k, {}), v, where + "/" + str(k))
            else:
                if k in dst and hasattr(dst[k], "shape") and dst[k].shape != v.shape:
                    raise ValueError(f"shape mismatch at {where}/{k}: {dst[k].shape} vs {v.shape}")
                out[k] = v
        return out

    new = {"params": overlay(variables["params"], params)}
    if "batch_stats" in variables:
        new["batch_stats"] = overlay(variables["batch_stats"], stats)
    return new
