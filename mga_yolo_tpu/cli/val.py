"""CLI: mga-val — validate a checkpoint on a dataset (mAP50/50-95/P/R)."""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    p = argparse.ArgumentParser("mga-val")
    p.add_argument("--weights", required=True, help="checkpoint dir (weights/best)")
    p.add_argument("--data", required=True, help="data YAML")
    p.add_argument("--imgsz", type=int, default=None)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--conf", type=float, default=0.001)
    p.add_argument("--iou", type=float, default=0.7)
    p.add_argument("--split", default="val")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from mga_yolo_tpu.config import load_config
    from mga_yolo_tpu.data.dataset import MGADataset
    from mga_yolo_tpu.data.loader import DataLoader
    from mga_yolo_tpu.ops.nms import nms_numpy
    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint
    from mga_yolo_tpu.utils.metrics import MetricAccumulator

    model, variables, meta = rebuild_from_checkpoint(args.weights)
    imgsz = args.imgsz or int(meta.get("imgsz", 640))
    cfg = load_config({"data": args.data, "imgsz": imgsz, "batch": args.batch})
    ds = MGADataset(cfg, args.split, augment=False)
    dl = DataLoader(ds, batch_size=min(args.batch, len(ds)), shuffle=False, drop_last=False)

    @jax.jit
    def forward(v, x):
        out = model.apply(v, x.astype(jax.numpy.float32) / 255.0, train=False)
        return out["det"][0]

    acc = MetricAccumulator()
    for batch in dl:
        decoded = np.asarray(forward(variables, jax.numpy.asarray(batch["image"])))
        for i in range(decoded.shape[0]):
            dets = nms_numpy(decoded[i], args.conf, args.iou)
            n = int(batch["mask_gt"][i].sum())
            acc.update(dets[:, :4], dets[:, 4], dets[:, 5],
                       batch["gt_boxes"][i, :n], batch["gt_labels"][i, :n].astype(np.float32))
    m = acc.compute()
    print(json.dumps(m.results_dict(), indent=2))


if __name__ == "__main__":
    main()
