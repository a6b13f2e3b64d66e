"""Import helper for using the torch reference at /root/reference as a test oracle.

The environment has CPU torch but no torchvision; the vendored ultralytics
only needs torchvision for NMS and version checks, so a minimal stub is
installed before import.  Nothing from the reference is copied — it is only
called to produce expected values.
"""

import sys
import types

import numpy as np


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    tv.__version__ = "0.0.0-stub"

    ops = types.ModuleType("torchvision.ops")

    def nms(boxes, scores, iou_threshold):
        """Greedy NMS (numpy) — same contract as torchvision.ops.nms."""
        b = boxes.detach().cpu().numpy()
        s = scores.detach().cpu().numpy()
        order = np.argsort(-s)
        keep = []
        while order.size:
            i = order[0]
            keep.append(i)
            if order.size == 1:
                break
            rest = order[1:]
            xx1 = np.maximum(b[i, 0], b[rest, 0])
            yy1 = np.maximum(b[i, 1], b[rest, 1])
            xx2 = np.minimum(b[i, 2], b[rest, 2])
            yy2 = np.minimum(b[i, 3], b[rest, 3])
            inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
            a1 = (b[i, 2] - b[i, 0]) * (b[i, 3] - b[i, 1])
            a2 = (b[rest, 2] - b[rest, 0]) * (b[rest, 3] - b[rest, 1])
            iou = inter / (a1 + a2 - inter + 1e-9)
            order = rest[iou <= iou_threshold]
        return torch.as_tensor(np.array(keep, dtype=np.int64))

    ops.nms = nms
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def _patch_importlib_metadata():
    """ultralytics reads torchvision's dist metadata; fake it in-process."""
    import importlib.metadata as md

    orig_version = md.version

    def version(name):
        if name == "torchvision":
            return "0.23.0"
        return orig_version(name)

    md.version = version


def setup_reference_paths():
    _install_torchvision_stub()
    _patch_importlib_metadata()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # mga_yolo/__init__ installs the vendored-ultralytics bridge on sys.path,
    # making `import ultralytics` resolve to the same module objects the
    # reference uses (avoids a duplicate package + circular imports).
    import mga_yolo  # noqa: F401

    # Prime the vendored ultralytics' FULL import chain before anything touches
    # mga_yolo.model.*: entering the reference's model<->trainer<->ultralytics
    # import cycle from mga_yolo.model first dies with "partially initialized
    # module 'mga_yolo.model.trainer'"; entering from ultralytics completes
    # (its yolo/__init__ imports detect before model.py needs MGATrainer).
    from mga_yolo.external.ultralytics import ultralytics  # noqa: F401
