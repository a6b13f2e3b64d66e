"""Callback/event bus + TensorBoard adapter.

Capability port of the reference callback system
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/utils/callbacks/`:
base hook dict fired via ``run_callbacks`` at on_train_start /
on_train_epoch_start / on_train_batch_end / on_fit_epoch_end /
on_model_save / on_train_end, plus TensorBoard/W&B/MLflow adapters).

The TPU trainer fires the same event names; adapters are plain callables
registered per event.  TensorBoard uses torch's pure-python writer when
available (no TF dependency), else disables itself.
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import Any, Callable, Dict, List

EVENTS = (
    "on_pretrain_routine_start",
    "on_train_start",
    "on_train_epoch_start",
    "on_train_batch_end",
    "on_train_epoch_end",
    "on_fit_epoch_end",
    "on_model_save",
    "on_train_end",
    "on_val_start",
    "on_val_end",
)


class CallbackBus:
    def __init__(self):
        self._hooks: Dict[str, List[Callable]] = defaultdict(list)

    def add(self, event: str, fn: Callable) -> None:
        if event not in EVENTS:
            raise ValueError(f"unknown event {event!r}; valid: {EVENTS}")
        self._hooks[event].append(fn)

    def fire(self, event: str, **kwargs: Any) -> None:
        for fn in self._hooks.get(event, ()):
            try:
                fn(**kwargs)
            except Exception as e:  # callbacks must never kill training
                print(f"[callbacks] {event} handler {fn} failed: {e}")


class TensorBoardLogger:
    """Scalar logging via torch.utils.tensorboard (optional)."""

    def __init__(self, log_dir: str | Path):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(str(log_dir))
        except Exception:
            self.writer = None

    def register(self, bus: CallbackBus) -> None:
        if self.writer is None:
            return
        bus.add("on_fit_epoch_end", self._on_epoch_end)
        bus.add("on_train_end", self._on_train_end)

    def _on_epoch_end(self, epoch: int = 0, row: dict | None = None, **_):
        if not row:
            return
        for k, v in row.items():
            if isinstance(v, (int, float)) and k != "epoch":
                self.writer.add_scalar(k, v, epoch)
        self.writer.flush()

    def _on_train_end(self, **_):
        self.writer.close()


class CSVLoggerCallback:
    """Example adapter: mirrors rows to an extra CSV (metrics_mirror.csv)."""

    def __init__(self, path: str | Path):
        self.path = Path(path)

    def register(self, bus: CallbackBus) -> None:
        bus.add("on_fit_epoch_end", self._on_epoch_end)

    def _on_epoch_end(self, row: dict | None = None, **_):
        if not row:
            return
        import csv

        exists = self.path.exists()
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=sorted(row.keys()))
            if not exists:
                w.writeheader()
            w.writerow(row)


class WandBLogger:
    """Weights & Biases adapter (reference utils/callbacks/wb.py).

    Import-guarded: a no-op when wandb is not installed (it is absent from
    this image's baked dependency set) or when init fails (offline sandbox).
    """

    def __init__(self, project: str, name: str, config: dict | None = None):
        try:
            import wandb

            self.run = wandb.init(project=project, name=name,
                                  config=config or {}, reinit=True)
            self._wandb = wandb
        except Exception:
            self.run = None

    def register(self, bus: CallbackBus) -> None:
        if self.run is None:
            return
        bus.add("on_fit_epoch_end", self._on_epoch_end)
        bus.add("on_train_end", self._on_train_end)

    def _on_epoch_end(self, epoch: int = 0, row: dict | None = None, **_):
        if row:
            self.run.log({k: v for k, v in row.items()
                          if isinstance(v, (int, float))}, step=epoch)

    def _on_train_end(self, **_):
        self.run.finish()


class MLflowLogger:
    """MLflow adapter (reference utils/callbacks/mlflow.py).

    Import-guarded like WandBLogger; logs params once at train start and
    metrics per epoch (sanitizing key characters mlflow rejects).
    """

    def __init__(self, experiment: str, run_name: str, tracking_uri: str | None = None):
        try:
            import mlflow

            if tracking_uri:
                mlflow.set_tracking_uri(tracking_uri)
            mlflow.set_experiment(experiment)
            self.run = mlflow.start_run(run_name=run_name)
            self._mlflow = mlflow
        except Exception:
            self.run = None

    @staticmethod
    def _clean(k: str) -> str:
        return "".join(c if (c.isalnum() or c in "_-./ ") else "_" for c in k)

    def register(self, bus: CallbackBus) -> None:
        if self.run is None:
            return
        bus.add("on_train_start", self._on_train_start)
        bus.add("on_fit_epoch_end", self._on_epoch_end)
        bus.add("on_train_end", self._on_train_end)

    def _on_train_start(self, trainer=None, **_):
        if trainer is not None:
            import dataclasses

            params = dataclasses.asdict(trainer.cfg.train)
            self._mlflow.log_params({self._clean(k): str(v) for k, v in params.items()})

    def _on_epoch_end(self, epoch: int = 0, row: dict | None = None, **_):
        if row:
            self._mlflow.log_metrics(
                {self._clean(k): float(v) for k, v in row.items()
                 if isinstance(v, (int, float))}, step=epoch)

    def _on_train_end(self, **_):
        self._mlflow.end_run()
