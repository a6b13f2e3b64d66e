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
    exp = sub.add_parser(
        "export-torch",
        help="export to the torch reference's minimal .pt checkpoint "
        "(gateway to its ONNX/TFLite deployment toolchain)",
    )
    exp.add_argument("path")
    exp.add_argument("out", help="output .pt path")
    exp.add_argument("--model", default=None, help="model YAML override")
    exp.add_argument("--scale", default=None)
    tfl = sub.add_parser(
        "export-tflite",
        help="direct jax -> .tflite export (decoded head + mask logits; "
        "NMS host-side like the reference TFLite export)",
    )
    tfl.add_argument("path")
    tfl.add_argument("--out", default=None, help="output .tflite path")
    tfl.add_argument("--imgsz", type=int, default=None)
    tfl.add_argument("--batch", type=int, default=1)
    tfl.add_argument("--quantize", choices=["fp16", "dynamic", "int8"], default=None)
    tfl.add_argument("--calib", default=None,
                     help="int8 calibration images (directory), e.g. the val set")
    tfl.add_argument("--no-verify", action="store_true")
    tfl.add_argument("--model", default=None, help="model YAML override")
    tfl.add_argument("--scale", default=None)
    svm = sub.add_parser(
        "export-savedmodel",
        help="TF SavedModel export of the eval forward (TF-Serving; "
        "StableHLO under XlaCallModule keeps XLA performance)",
    )
    svm.add_argument("path")
    svm.add_argument("out", help="output SavedModel directory")
    svm.add_argument("--imgsz", type=int, default=None)
    svm.add_argument("--batch", type=int, default=1)
    svm.add_argument("--no-verify", action="store_true")
    svm.add_argument("--model", default=None, help="model YAML override")
    svm.add_argument("--scale", default=None)
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

    if args.cmd == "export-savedmodel":
        from mga_yolo_tpu.utils.tflite_export import export_saved_model

        info = export_saved_model(
            args.path, args.out, imgsz=args.imgsz, batch=args.batch,
            model_yaml=args.model, scale=args.scale, verify=not args.no_verify,
        )
        print(f"[mga-ckpt] SavedModel -> {info['path']} (imgsz {info['imgsz']})")
        if info["max_abs_diff_decoded"] is not None:
            print(
                f"[mga-ckpt] verified vs jax forward: outputs {info['outputs']}, "
                f"max |d| decoded = {info['max_abs_diff_decoded']:.2e}"
            )
        return

    if args.cmd == "export-tflite":
        from mga_yolo_tpu.utils.tflite_export import export_tflite

        info = export_tflite(
            args.path, args.out, imgsz=args.imgsz, batch=args.batch,
            model_yaml=args.model, scale=args.scale, quantize=args.quantize,
            verify=not args.no_verify, representative=args.calib,
        )
        print(
            f"[mga-ckpt] tflite -> {info['path']} ({info['bytes'] / 1e6:.2f} MB, "
            f"imgsz {info['imgsz']}, quantize {info['quantize']})"
        )
        if info["max_abs_diff_decoded"] is not None:
            print(
                f"[mga-ckpt] verified vs jax forward: outputs {info['outputs']}, "
                f"max |d| decoded = {info['max_abs_diff_decoded']:.2e}"
            )
        return

    model, variables, meta = rebuild_from_checkpoint(args.path, args.model, args.scale)
    if args.cmd == "export-torch":
        from mga_yolo_tpu.utils.torch_export import save_reference_checkpoint

        save_reference_checkpoint(
            variables, model.spec, args.out, nc=int(meta.get("nc", 1)),
            model_yaml=meta.get("model_yaml"), is_ema=True,
        )
        n = len(jax.tree_util.tree_leaves(variables["params"]))
        print(f"[mga-ckpt] exported {n} tensors -> {args.out} (reference minimal-ckpt format, EMA weights)")
        return
    leaves = jax.tree_util.tree_leaves(variables["params"])
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    print(f"model:  {meta.get('model_yaml')} scale={meta.get('model_scale')}")
    print(f"nc:     {meta.get('nc')}  imgsz: {meta.get('imgsz')}")
    print(f"params: {n_params / 1e6:.3f} M ({len(leaves)} tensors)")
    keys = list(variables["params"].keys())
    print(f"layers: {keys[:5]} ... {keys[-3:]}")


if __name__ == "__main__":
    main()
