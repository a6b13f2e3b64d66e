"""MGA-YOLO-TPU: TPU-native mask-guided-attention YOLO framework (JAX/XLA/Pallas).

Public API (lazy imports keep `import mga_yolo_tpu` light):

    from mga_yolo_tpu import MGA, load_config, create_model, MGATrainer
    from mga_yolo_tpu import MGAPredictor, load_predictor
"""

from __future__ import annotations

__version__ = "0.1.0"

__all__ = [
    "MGA",
    "load_config",
    "MGAConfig",
    "create_model",
    "MGAModel",
    "parse_graph",
    "MGATrainer",
    "MGAPredictor",
    "load_predictor",
    "rebuild_from_checkpoint",
]


def __getattr__(name):
    if name == "MGA":
        from mga_yolo_tpu.api import MGA

        return MGA
    if name in ("load_config", "MGAConfig"):
        from mga_yolo_tpu import config as _m

        return getattr(_m, name)
    if name in ("create_model", "MGAModel"):
        from mga_yolo_tpu.models import yolo as _m

        return getattr(_m, name)
    if name == "parse_graph":
        from mga_yolo_tpu.graph import parse_graph

        return parse_graph
    if name == "MGATrainer":
        from mga_yolo_tpu.train.trainer import MGATrainer

        return MGATrainer
    if name in ("MGAPredictor", "load_predictor"):
        from mga_yolo_tpu.train import predictor as _m

        return getattr(_m, name)
    if name == "rebuild_from_checkpoint":
        from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

        return rebuild_from_checkpoint
    raise AttributeError(name)
