"""Checkpointing: orbax save/restore + rebuild-from-YAML minimal loading.

Replaces the reference's dual checkpoint formats (pickle .pt +
"minimal state-dict" .pt, SURVEY.md §5.4) with one canonical orbax format
holding {params, batch_stats, ema_params, ema_batch_stats, opt_state,
step/opt_step/last_apply} plus a JSON metadata sidecar, while keeping the reference's
"rebuild model from YAML + state only" property
(`/root/reference/mga_yolo/model/checkpoint.py:19-99`) including nc
inference from metadata.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _donation_safe_copy(tree):
    """Device-copy a state tree so buffer donation cannot invalidate it.

    Single-process: ``jnp.copy`` (async, keeps the D2H off the critical
    path). Multi-process: ``jnp.copy`` on a globally-sharded array dispatches
    an SPMD program that EVERY process must execute — running it from the
    rank-0-gated save path alone leaves the other hosts out of the collective
    clique and kills the cluster with a Gloo rendezvous timeout (caught by
    tests/test_multiprocess_spmd.py). The state is fully replicated, so the
    process-local ``np.asarray`` fetch is collective-free and equivalent.
    """
    if jax.process_count() > 1:
        return _to_numpy_tree(tree)
    return jax.tree_util.tree_map(jnp_copy, tree)


def _structured_views(state):
    """(opt_state, ema_params, ema_batch_stats) as STRUCTURED trees.

    TrainState stores momentum/EMA flat (train/state.py flat-buffer note);
    the on-disk checkpoint format stays structured — unflattening here keeps
    old and new checkpoints byte-layout compatible in both directions."""
    from mga_yolo_tpu.train.optim import FlatMeta
    from mga_yolo_tpu.train.state import ema_variables

    meta_p = FlatMeta(state.params)
    opt_state = {k: meta_p.unflatten(v) for k, v in state.opt_state.items()}
    ema_params, ema_bs = ema_variables(state)
    return opt_state, ema_params, ema_bs


def _payload(state, to_numpy: bool = True):
    conv = _to_numpy_tree if to_numpy else _donation_safe_copy
    opt_state, ema_params, ema_bs = _structured_views(state)
    return {
        "step": conv(state.step),
        "opt_step": conv(state.opt_step),
        "last_apply": conv(state.last_apply),
        "params": conv(state.params),
        "batch_stats": conv(state.batch_stats),
        "opt_state": conv(opt_state),
        "ema_params": conv(ema_params),
        "ema_batch_stats": conv(ema_bs),
    }


def jnp_copy(x):
    import jax.numpy as jnp

    return jnp.copy(x)


_ASYNC_CKPTR = None


def _mp_options():
    """Scope orbax's multihost barriers to process 0 in multi-process runs.

    Checkpoints are written from the rank-0-gated trainer path (reference
    DDP semantics, `engine/trainer.py:628`); orbax's default barriers span
    every process and would deadlock when only host 0 calls save.
    """
    import orbax.checkpoint as ocp

    if jax.process_count() > 1:
        return {"multiprocessing_options": ocp.options.MultiprocessingOptions(
            primary_host=0, active_processes={0})}
    return {}


def _async_checkpointer():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler(),
                                             **_mp_options())
    return _ASYNC_CKPTR


def save_checkpoint(path: str | Path, state, metadata: dict,
                    async_save: bool = False) -> None:
    """Write an orbax checkpoint + metadata.json.

    ``async_save`` overlaps the D2H transfer + disk write with subsequent
    training (the per-epoch best/last saves of a ~100 MB TrainState cost
    tens of seconds over the remote TPU tunnel when synchronous). The state
    is device-copied first so buffer donation in the next train step cannot
    invalidate what the background thread is still reading; orbax serializes
    consecutive async saves internally. Call :func:`wait_for_saves` before
    reading a checkpoint back or exiting.
    """
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    if async_save:
        ckptr = _async_checkpointer()
        payload = _payload(state, to_numpy=False)  # device copies, donation-safe
        ckptr.save(path, args=ocp.args.StandardSave(payload), force=True)
    else:
        with ocp.StandardCheckpointer(**_mp_options()) as ckptr:
            ckptr.save(path, _payload(state), force=True)
    (path.parent / (path.name + ".meta.json")).write_text(json.dumps(metadata, indent=2))


def wait_for_saves() -> None:
    """Block until all in-flight async checkpoint saves have committed."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(path: str | Path, state) -> Tuple[Any, dict]:
    """Restore into an existing TrainState (template provides the structure)."""
    import orbax.checkpoint as ocp

    from mga_yolo_tpu.train.optim import flatten_tree

    wait_for_saves()  # an async save of this very path may still be in flight
    path = Path(path).absolute()
    # on-disk format is STRUCTURED (see _structured_views); build structured
    # templates from the params/batch_stats trees and re-flatten after restore
    params_np = _to_numpy_tree(state.params)
    bs_np = _to_numpy_tree(state.batch_stats)
    template = {
        "step": np.asarray(state.step),
        "opt_step": np.asarray(state.opt_step),
        "last_apply": np.asarray(state.last_apply),
        "params": params_np,
        "batch_stats": bs_np,
        "opt_state": {k: jax.tree_util.tree_map(np.copy, params_np)
                      for k in state.opt_state},
        "ema_params": jax.tree_util.tree_map(np.copy, params_np),
        "ema_batch_stats": jax.tree_util.tree_map(np.copy, bs_np),
    }
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, template)
    meta_path = path.parent / (path.name + ".meta.json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    new_state = state.replace(
        step=restored["step"],
        opt_step=restored["opt_step"],
        last_apply=restored["last_apply"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state={k: flatten_tree(v) for k, v in restored["opt_state"].items()},
        ema_params=flatten_tree(restored["ema_params"]),
        ema_batch_stats=(flatten_tree(restored["ema_batch_stats"])
                         if restored.get("ema_batch_stats") else None),
    )
    return new_state, meta


def rebuild_from_checkpoint(path: str | Path, model_yaml: Optional[str] = None,
                            scale: Optional[str] = None, prefer_ema: bool = True,
                            tap_indices: tuple = (), use_pallas: "bool | str | None" = "auto"):
    """Rebuild (model, variables, meta) from a checkpoint directory alone.

    Mirrors `rebuild_mga_model_from_minimal_ckpt`: the model graph is rebuilt
    from the YAML recorded in metadata (or an override), nc comes from
    metadata, and EMA weights are preferred (reference checkpoint.py:46).
    """
    import orbax.checkpoint as ocp

    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train.state import create_train_state

    path = Path(path).absolute()
    meta_path = path.parent / (path.name + ".meta.json")
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    model_yaml = model_yaml or meta.get("model_yaml")
    scale = scale or meta.get("model_scale", "n")
    nc = meta.get("nc")
    if model_yaml is None or not Path(model_yaml).exists():
        # metadata may record a path from another working directory — or only
        # the embedded YAML text; fall back to that (ADVICE r1: relative
        # model_yaml breaks mga-ckpt from other cwds)
        yaml_text = meta.get("model_yaml_text")
        if yaml_text:
            import tempfile

            tmp = Path(tempfile.mkstemp(suffix=".yaml")[1])
            tmp.write_text(yaml_text)
            model_yaml = str(tmp)
    if model_yaml is None:
        raise ValueError("model YAML unknown: pass model_yaml or keep metadata.json")

    # inference surface: "auto" -> fused Pallas attention on TPU (the shipped
    # default path; bench.py measures this same path)
    model, spec = create_model(model_yaml, scale=scale, nc=nc,
                               tap_indices=tuple(tap_indices),
                               use_pallas=use_pallas, training=False)
    state = create_train_state(
        model, jax.random.PRNGKey(0), imgsz=int(meta.get("imgsz", 64)),
        opt_name=meta.get("optimizer", "sgd"),
    )
    state, _ = load_checkpoint(path, state)
    if prefer_ema:
        from mga_yolo_tpu.train.state import ema_variables

        params, bs = ema_variables(state)
    else:
        params, bs = state.params, state.batch_stats
    variables = {"params": {k: v for k, v in params.items() if k != "mtl_log_vars"}}
    if bs:
        variables["batch_stats"] = bs
    return model, variables, meta
