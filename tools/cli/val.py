"""Baseline validator CLI with feature-map capture (BaseFMValidator parity).

Re-implements the capability of the reference baseline toolchain validator
(`/root/reference/tools/engine/validators/base_fm_validator.py:18-335` and
`/root/reference/tools/cli/val.py:45-90`): detection metrics on a plain
(no-MGA) model plus per-layer feature-map capture — default layers 15/18/21,
the P3/P4/P5 neck outputs of the base graph (`BASE_FM_LAYERS` env in the
reference) — saved as .npy tensors + channel-grid PNGs, with prediction
overlays.

Where the reference registers torch forward hooks, this build asks the graph
for taps (`create_model(tap_indices=...)`) — intermediates are ordinary
outputs of the jitted forward (SURVEY.md §5.1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    p = argparse.ArgumentParser("base-val")
    p.add_argument("--weights", required=True, help="checkpoint dir (weights/best)")
    p.add_argument("--data", required=True, help="data YAML")
    p.add_argument("--imgsz", type=int, default=None)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--iou", type=float, default=0.7)
    p.add_argument("--split", default="val")
    p.add_argument("--save-fm", action="store_true", help="capture feature maps")
    p.add_argument("--save-layers", default=os.environ.get("BASE_FM_LAYERS", "15,18,21"),
                   help="comma-separated layer indices to capture")
    p.add_argument("--save-fm-max", type=int,
                   default=int(os.environ.get("BASE_FM_MAX", "4")),
                   help="max batches to capture")
    p.add_argument("--out", default="runs/base_val")
    args = p.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mga_yolo_tpu.config import load_config
    from mga_yolo_tpu.data.dataset import MGADataset
    from mga_yolo_tpu.data.loader import DataLoader
    from mga_yolo_tpu.ops.nms import nms_numpy
    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint
    from mga_yolo_tpu.utils.files import increment_path
    from mga_yolo_tpu.utils.metrics import MetricAccumulator

    layers = tuple(int(x) for x in str(args.save_layers).split(",") if x.strip())
    model, variables, meta = rebuild_from_checkpoint(
        args.weights, tap_indices=layers if args.save_fm else ()
    )
    imgsz = args.imgsz or int(meta.get("imgsz", 640))
    cfg = load_config({"data": args.data, "imgsz": imgsz, "batch": args.batch})
    ds = MGADataset(cfg, args.split, augment=False)
    dl = DataLoader(ds, batch_size=min(args.batch, len(ds)), shuffle=False, drop_last=False)
    out_dir = increment_path(Path(args.out))
    fm_dir = out_dir / "fm"
    pred_dir = out_dir / "preds"

    @jax.jit
    def forward(v, x):
        out = model.apply(v, x.astype(jnp.float32) / 255.0, train=False)
        return out["det"][0], out.get("taps", {})

    acc = MetricAccumulator()
    saved = 0
    for bi, batch in enumerate(dl):
        decoded, taps = forward(variables, jnp.asarray(batch["image"]))
        decoded = np.asarray(decoded, np.float32)
        for i in range(decoded.shape[0]):
            dets = nms_numpy(decoded[i], args.conf, args.iou)
            n = int(batch["mask_gt"][i].sum())
            acc.update(dets[:, :4], dets[:, 4], dets[:, 5],
                       batch["gt_boxes"][i, :n],
                       batch["gt_labels"][i, :n].astype(np.float32))
        if args.save_fm and saved < args.save_fm_max:
            from mga_yolo_tpu.utils.plotting import feature_visualization

            fm_dir.mkdir(parents=True, exist_ok=True)
            pred_dir.mkdir(parents=True, exist_ok=True)
            for idx, feat in taps.items():
                arr = np.asarray(feat, np.float32)
                np.save(fm_dir / f"batch{bi}_layer{idx}.npy", arr)
                feature_visualization(arr[0], fm_dir / f"batch{bi}_layer{idx}.png")
            # prediction overlays (reference saves pred JPEGs, no masks)
            for i in range(min(decoded.shape[0], 4)):
                dets = nms_numpy(decoded[i], 0.25, args.iou, max_det=50)
                im = np.ascontiguousarray(batch["image"][i])
                for x1, y1, x2, y2, conf, c in dets:
                    cv2.rectangle(im, (int(x1), int(y1)), (int(x2), int(y2)), (0, 255, 0), 1)
                cv2.imwrite(str(pred_dir / f"batch{bi}_img{i}_dets.jpg"), im)
            saved += 1

    m = acc.compute()
    out_dir.mkdir(parents=True, exist_ok=True)
    (out_dir / "metrics.json").write_text(json.dumps(m.results_dict(), indent=2))
    print(json.dumps(m.results_dict(), indent=2))


if __name__ == "__main__":
    main()
