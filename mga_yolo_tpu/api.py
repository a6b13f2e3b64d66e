"""User-facing facade — the reference's ``YOLO(model, task="mga")`` surface.

Reference: `engine/model.py:757` train / `:517` predict / `:622` val on the
Ultralytics Model facade, with MGA task auto-detection
(`models/yolo/model.py:77-87`: force task "mga" when the YAML name contains
"mga"/a mask-head module). Here the facade wraps the typed config + trainer +
predictor; task detection inspects the parsed graph instead of sniffing text.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

from mga_yolo_tpu.config import load_config
from mga_yolo_tpu.graph import parse_graph


class MGA:
    """Facade: model YAML or checkpoint in, train/val/predict out.

    >>> m = MGA("configs/models/yolov8_cbam.yaml", scale="n")
    >>> m.train(data="data.yaml", epochs=100, imgsz=512)
    >>> results = m.predict(["img.png"])
    """

    def __init__(self, model: str | Path, scale: str = "n", task: Optional[str] = None):
        self.model_path = str(model)
        self.scale = scale
        self._ckpt: Optional[Path] = None
        if str(model).endswith((".yaml", ".yml")):
            self.spec = parse_graph(model, scale=scale)
        else:  # checkpoint directory
            self._ckpt = Path(model)
            from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

            _, _, meta = rebuild_from_checkpoint(self._ckpt)
            self.model_path = meta.get("model_yaml", self.model_path)
            self.scale = meta.get("model_scale", scale)
            self.spec = parse_graph(self.model_path, scale=self.scale, nc=meta.get("nc"))
        # task auto-detection: "mga" iff the graph has mask heads
        self.task = task or ("mga" if self.spec.mask_head_indices else "detect")

    def train(self, cfg: str | dict | None = None, **overrides):
        from mga_yolo_tpu.train.trainer import MGATrainer

        overrides.setdefault("model", self.model_path)
        overrides.setdefault("model_scale", self.scale)
        overrides.setdefault("task", self.task)
        if self.task != "mga":
            overrides.setdefault("enabled", False)
        config = load_config(cfg, **overrides)
        trainer = MGATrainer(config)
        result = trainer.train()
        self._ckpt = trainer.save_dir / "weights" / "best"  # increment_path-aware
        self._trainer = trainer
        return result

    def val(self, data: str, **kw):
        from mga_yolo_tpu.cli.val import main as val_main

        if self._ckpt is None:
            raise RuntimeError("no weights: train first or construct from a checkpoint")
        args = ["--weights", str(self._ckpt), "--data", data]
        for k, v in kw.items():
            args += [f"--{k}", str(v)]
        return val_main(args)

    def predict(self, sources, **kw):
        from mga_yolo_tpu.train.predictor import load_predictor

        if self._ckpt is None:
            raise RuntimeError("no weights: train first or construct from a checkpoint")
        pred = load_predictor(self._ckpt, model_yaml=self.model_path, scale=self.scale, **kw)
        return pred(sources)

    def info(self):
        from mga_yolo_tpu.utils.model_utils import model_info

        return model_info(self.spec)
