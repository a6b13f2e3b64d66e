"""Model utilities: BN-fold fusion + static model info.

* :func:`fuse_variables` — the reference's ``BaseModel.fuse()``
  (`nn/tasks.py` Conv.fuse_convs): folds BatchNorm running stats into the
  preceding conv kernel so inference needs no normalization math.  The
  variable-tree *structure is preserved* (BN becomes an identity affine), so
  the same module graph applies fused or unfused.  Note: under XLA the BN
  affine already fuses into the conv epilogue, so this is a capability-parity
  feature (e.g. for weight export), not a speed lever like in eager torch.
* :func:`model_info` — layer table / parameter counts / analytic conv GFLOPs
  from the static GraphSpec (reference ``model.info()`` surface,
  tests/test_model_info_configs.py).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mga_yolo_tpu.graph import GraphSpec


def _fold_one(conv_bn: dict, stats: dict, eps: float = 1e-3) -> tuple[dict, dict]:
    """Fold one {conv:{kernel}, bn:{scale,bias}} + stats{bn:{mean,var}} pair."""
    kernel = conv_bn["conv"]["kernel"]
    scale = conv_bn["bn"]["scale"]
    bias = conv_bn["bn"]["bias"]
    mean = stats["bn"]["mean"]
    var = stats["bn"]["var"]
    factor = scale / jnp.sqrt(var + eps)               # (Cout,)
    # BN with (mean=0, var=1, scale=1, bias=b') computes x/sqrt(1+eps)+b',
    # so pre-scale the kernel by sqrt(1+eps) to cancel exactly.
    new_kernel = kernel * factor * math.sqrt(1.0 + eps)
    new_bias = bias - mean * factor
    fused = {
        "conv": {"kernel": new_kernel},
        "bn": {"scale": jnp.ones_like(scale), "bias": new_bias},
    }
    fused_stats = {"bn": {"mean": jnp.zeros_like(mean), "var": jnp.ones_like(var)}}
    return fused, fused_stats


def _walk(params: Any, stats: Any):
    """Recursively fold every conv+bn pair found in parallel trees."""
    if not isinstance(params, dict):
        return params, stats
    if "conv" in params and "bn" in params and isinstance(stats, dict) and "bn" in stats:
        return _fold_one(params, stats)
    new_p, new_s = {}, {}
    for k, v in params.items():
        sv = stats.get(k, {}) if isinstance(stats, dict) else {}
        if isinstance(v, dict):
            fp, fs = _walk(v, sv)
            new_p[k] = fp
            if sv or fs:
                new_s[k] = fs
        else:
            new_p[k] = v
    # preserve stats entries not touched (e.g. non-conv BN)
    if isinstance(stats, dict):
        for k, v in stats.items():
            if k not in new_s:
                new_s[k] = v
    return new_p, new_s


def fuse_variables(variables: dict) -> dict:
    """Return variables with every ConvBN folded (inference only)."""
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    fp, fs = _walk(params, stats)
    out = {"params": fp}
    if fs:
        out["batch_stats"] = fs
    return out


def model_info(spec: GraphSpec, params: Any = None, imgsz: int = 640) -> dict:
    """Static model summary: per-layer table + params + analytic conv GFLOPs."""
    from mga_yolo_tpu.models.yolo import compute_strides

    strides = compute_strides(spec)
    rows = []
    for node in spec.nodes:
        rows.append(
            {
                "i": node.index,
                "from": node.from_,
                "module": node.module,
                "args": list(node.args),
                "c_out": node.c_out,
                "stride": strides[node.index],
            }
        )
    n_params = None
    if params is not None:
        n_params = int(sum(np.prod(p.shape) for p in jax.tree_util.tree_leaves(params)))
    return {
        "layers": rows,
        "n_layers": len(rows),
        "parameters": n_params,
        "nc": spec.nc,
        "scale": spec.scale,
        "detect_strides": [strides[i] for i in spec.nodes[spec.detect_index].inputs],
        "imgsz": imgsz,
    }
