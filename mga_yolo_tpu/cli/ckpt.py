"""CLI: mga-ckpt — inspect / rebuild a checkpoint.

Mirrors `/root/reference/mga_yolo/cli/mga_ckpt.py:14-55`: rebuild the model
from a minimal checkpoint, print parameter counts and sample keys.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    p = argparse.ArgumentParser("mga-ckpt")
    sub = p.add_subparsers(dest="cmd", required=True)
    load = sub.add_parser("load", help="rebuild model from checkpoint and report")
    load.add_argument("path")
    load.add_argument("--model", default=None, help="model YAML override")
    load.add_argument("--scale", default=None)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

    model, variables, meta = rebuild_from_checkpoint(args.path, args.model, args.scale)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    print(f"model:  {meta.get('model_yaml')} scale={meta.get('model_scale')}")
    print(f"nc:     {meta.get('nc')}  imgsz: {meta.get('imgsz')}")
    print(f"params: {n_params / 1e6:.3f} M ({len(leaves)} tensors)")
    keys = list(variables["params"].keys())
    print(f"layers: {keys[:5]} ... {keys[-3:]}")


if __name__ == "__main__":
    main()
