"""`mga-profile` — per-layer params/FLOPs table for a model graph.

Equivalent of the reference's ``profile=True`` per-layer report
(`nn/tasks.py` ``_profile_one_layer``), computed from XLA HLO cost analysis
instead of wall timing (see `utils/layer_profile.py`).

Usage:
    python -m mga_yolo_tpu.cli.profile --model configs/models/yolov8_cbam.yaml \
        [--scale n] [--imgsz 640] [--yaml out.yaml]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser("mga-profile")
    p.add_argument("--model", default="configs/models/yolov8_cbam.yaml")
    p.add_argument("--scale", default="n")
    p.add_argument("--nc", type=int, default=1)
    p.add_argument("--imgsz", type=int, default=640)
    p.add_argument("--yaml", default=None, help="also write rows to this YAML file")
    args = p.parse_args(argv)

    import jax

    # HLO-level cost analysis is platform-independent but only available
    # pre-compile on the CPU backend (the axon/TPU tunnel returns None until
    # the remote compile finishes) — force CPU: zero device work needed.
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.utils.layer_profile import format_table, profile_layers

    model, spec = create_model(args.model, scale=args.scale, nc=args.nc)
    variables = jax.eval_shape(
        lambda r, x: model.init(r, x, train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((1, args.imgsz, args.imgsz, 3), np.float32),
    )
    # eval_shape gives abstract leaves; profile only needs shapes, and real
    # arrays are only needed for param counting — instantiate zeros lazily
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables
    )
    rows = profile_layers(model, dict(variables), args.imgsz)
    print(format_table(rows))
    if args.yaml:
        import yaml

        with open(args.yaml, "w") as f:
            yaml.safe_dump({"layers": rows}, f, sort_keys=False)
        print(f"[mga-profile] wrote {args.yaml}")


if __name__ == "__main__":
    main()
