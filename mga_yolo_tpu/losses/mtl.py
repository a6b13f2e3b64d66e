"""Kendall homoscedastic-uncertainty multi-task weighting.

Reference: `/root/reference/mga_yolo/model/model.py:204-206` and the math in
`mga_yolo/nn/losses/README.md:11-104`:

    L = exp(-s_det) * L_det + s_det + exp(-s_seg) * L_seg + s_seg

where ``s_* = log(sigma^2)`` are two learnable scalars (``mtl_log_vars``),
carried in the parameter tree and optimized jointly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def kendall_combine(l_det: jax.Array, l_seg: jax.Array, log_vars: jax.Array):
    """Combine det/seg losses with learned log-variances (shape (2,)).

    Returns (total, logs {sigma2_det, sigma2_seg, w_det, w_seg}).
    """
    s_det, s_seg = log_vars[0], log_vars[1]
    w_det = jnp.exp(-s_det)
    w_seg = jnp.exp(-s_seg)
    total = w_det * l_det + s_det + w_seg * l_seg + s_seg
    logs = {
        "mtl/sigma2_det": jax.lax.stop_gradient(jnp.exp(s_det)),
        "mtl/sigma2_seg": jax.lax.stop_gradient(jnp.exp(s_seg)),
        "mtl/w_det": jax.lax.stop_gradient(w_det),
        "mtl/w_seg": jax.lax.stop_gradient(w_seg),
    }
    return total, logs
