"""CLI: mga-val — validate a checkpoint on a dataset (mAP50/50-95/P/R).

Mirrors the reference validation entry (`yolo val` -> DetectionValidator,
`/root/reference/mga_yolo/external/ultralytics/ultralytics/models/yolo/detect/val.py`):
per-class results table, speed dict, and with ``--plots`` the confusion
matrix + PR/F1/P/R curve PNGs (val.py:199-223), with ``--save-json`` COCO
predictions.json (val.py:365 pred_to_json).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    p = argparse.ArgumentParser("mga-val")
    p.add_argument("--weights", required=True,
                   help="checkpoint dir (weights/best) or an exported .tflite")
    p.add_argument("--data", required=True, help="data YAML")
    p.add_argument("--imgsz", type=int, default=None)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--iou", type=float, default=0.7)
    p.add_argument("--max-det", type=int, default=300)
    p.add_argument("--split", default="val")
    p.add_argument("--rect", action="store_true",
                   help="rectangular batching (static aspect buckets)")
    p.add_argument("--plots", action="store_true",
                   help="save confusion matrix + PR/F1/P/R curves")
    p.add_argument("--save-json", action="store_true",
                   help="save COCO-format predictions.json")
    p.add_argument("--out", default=None, help="output dir (default: runs/val)")
    p.add_argument("--use-pallas", default="auto", choices=["auto", "true", "false"],
                   help="fused Pallas attention kernels (auto = on when on TPU)")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mga_yolo_tpu.config import load_config
    from mga_yolo_tpu.utils.compile_cache import enable_compile_cache

    from mga_yolo_tpu.data.dataset import MGADataset
    from mga_yolo_tpu.data.loader import DataLoader
    from mga_yolo_tpu.ops.nms import nms_jax
    from mga_yolo_tpu.train.validator import Validator
    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint
    from mga_yolo_tpu.utils.files import increment_path

    enable_compile_cache()
    is_tflite = str(args.weights).endswith(".tflite")
    is_saved_model = (Path(args.weights) / "saved_model.pb").is_file()
    if is_saved_model:
        # validate an exported SavedModel (TF-Serving artifact): load-back
        # inference with the shared NMS/metrics stack
        import tensorflow as tf

        loaded = tf.saved_model.load(str(args.weights))
        sig = loaded.f.concrete_functions[0]
        in_spec = sig.inputs[0].shape.as_list()  # (B, S, S, 3)
        sm_batch = int(in_spec[0])
        imgsz = args.imgsz or int(in_spec[1])
        nc = None  # resolved from the decoded output below
        variables = None
    elif is_tflite:
        # validate an exported deployment artifact (reference `model.val()`
        # on exported formats, engine/exporter.py): the flatbuffer runs on
        # host via the TFLite interpreter, NMS + metrics are shared with the
        # checkpoint path, so the printed mAP is the deployed model's mAP.
        import tensorflow as tf

        from mga_yolo_tpu.utils.tflite_export import decoded_output_details, make_interpreter

        interp = make_interpreter(model_path=str(args.weights))
        inp0 = interp.get_input_details()[0]
        imgsz = args.imgsz or int(inp0["shape"][1])
        # one decoded output (combined layout) or boxes+scores (int8 split)
        dec_outs, nc = decoded_output_details(interp)
        variables = None
    else:
        model, variables, meta = rebuild_from_checkpoint(
            args.weights, use_pallas=args.use_pallas
        )
        imgsz = args.imgsz or int(meta.get("imgsz", 640))
        nc = int(meta.get("nc", 1))
    if is_saved_model:
        import tensorflow as tf

        probe = loaded.f(tf.zeros((sm_batch, imgsz, imgsz, 3), tf.float32))
        nc = int([p.shape[-1] for p in probe if len(p.shape) == 3][0]) - 4
    cfg = load_config(
        {"data": args.data, "imgsz": imgsz, "batch": args.batch, "rect": args.rect}
    )
    ds = MGADataset(cfg, args.split, augment=False)
    dl = DataLoader(ds, batch_size=min(args.batch, len(ds)), shuffle=False, drop_last=False)

    @jax.jit
    def nms_fn(decoded):
        boxes, scores, cls = nms_jax(
            decoded, conf_thres=args.conf, iou_thres=args.iou,
            max_det=args.max_det, multi_label=nc > 1,
        )
        return jnp.concatenate([boxes, scores[..., None], cls[..., None]], axis=-1)

    if is_saved_model:
        import tensorflow as tf

        def eval_fn(v, batch):
            x = np.asarray(batch["image"], np.float32)  # 0-255: /255 is embedded
            outs = []
            for i in range(0, x.shape[0], sm_batch):
                chunk = x[i : i + sm_batch]
                pad = sm_batch - chunk.shape[0]
                if pad:
                    chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
                got = loaded.f(tf.constant(chunk))
                dec = [p.numpy() for p in got if len(p.shape) == 3][0]
                outs.append(dec[: sm_batch - pad or None])
            decoded = jnp.asarray(np.concatenate(outs))
            return {"decoded": decoded, "dets": nms_fn(decoded),
                    "items": jnp.zeros((10,), jnp.float32)}
    elif is_tflite:
        # the flatbuffer's batch is BAKED (reshapes lower with constant
        # shapes; resize_tensor_input silently yields batch-1 outputs and
        # polymorphic-batch export hits TFLite's missing dynamic_gather), so
        # run the interpreter at its exported batch and chunk/pad host-side
        fixed_b = int(inp0["shape"][0])

        def eval_fn(v, batch):
            x = np.asarray(batch["image"], np.float32)  # 0-255: /255 is embedded
            outs = []
            for i in range(0, x.shape[0], fixed_b):
                chunk = x[i : i + fixed_b]
                pad = fixed_b - chunk.shape[0]
                if pad:
                    chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
                interp.set_tensor(inp0["index"], chunk)
                interp.invoke()
                keep = fixed_b - pad or None
                parts = [interp.get_tensor(o["index"])[:keep] for o in dec_outs]
                outs.append(parts[0] if len(parts) == 1 else
                            np.concatenate(parts, axis=-1))
            decoded = jnp.asarray(np.concatenate(outs))
            return {"decoded": decoded, "dets": nms_fn(decoded),
                    "items": jnp.zeros((10,), jnp.float32)}
    else:

        @jax.jit
        def eval_fn(v, batch):
            out = model.apply(v, batch["image"].astype(jnp.float32) / 255.0, train=False)
            decoded = out["det"][0].astype(jnp.float32)
            return {"decoded": decoded, "dets": nms_fn(decoded),
                    "items": jnp.zeros((10,), jnp.float32)}

    validator = Validator(eval_fn, dl, cfg, conf_thres=args.conf,
                          iou_thres=args.iou, max_det=args.max_det)
    out_dir = None
    if args.out or args.plots or args.save_json:
        out_dir = increment_path(Path(args.out) if args.out else Path("runs") / "val")
        out_dir.mkdir(parents=True, exist_ok=True)
    result = validator(
        variables,
        plots_dir=out_dir if args.plots else None,
        save_json=(out_dir / "predictions.json") if args.save_json else None,
        verbose=True,
    )
    speed_str = ", ".join(f"{k} {v:.1f}ms" for k, v in result.speed.items())
    print(f"speed: {speed_str} per image")
    print(json.dumps(result.results_dict(), indent=2))
    if out_dir is not None:
        # machine-readable record (metrics + speed), so harnesses like
        # tools/scripts/int8_demo.sh can tabulate artifact accuracy without
        # scraping stdout (reference validator saves to save_dir similarly)
        with open(out_dir / "metrics.json", "w") as f:
            json.dump({**result.results_dict(), "speed": result.speed}, f, indent=2)
        print(f"[mga-val] metrics -> {out_dir / 'metrics.json'}")


if __name__ == "__main__":
    main()
