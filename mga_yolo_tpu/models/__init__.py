"""Model package. Exposes the SEG/ATT diagnostic loggers.

Parity with the reference `mga_yolo/nn/modules/__init__.py:1-23`, which
creates dedicated stdlib loggers for the segmentation and attention
subsystems at DEBUG level. Here they are emitted host-side from the trainer
(per-epoch seg losses, learned attention gates) since jitted module code
cannot log per step.
"""

import logging


def _make_logger(name: str) -> logging.Logger:
    lg = logging.getLogger(name)
    lg.setLevel(logging.DEBUG)
    return lg


SEG_LOGGER = _make_logger("mga.seg")
ATT_LOGGER = _make_logger("mga.att")
