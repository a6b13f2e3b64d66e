"""CLI: mga-train --cfg config.yaml [--key value ...]

Mirrors the reference console script (`/root/reference/cli/mga_train.py:59-93`):
a training YAML plus arbitrary ``--key value`` overrides parsed with
yaml.safe_load (so numbers/bools/lists round-trip), forwarded to the trainer.
"""

from __future__ import annotations

import argparse
import sys
from typing import Any

import yaml


def parse_overrides(argv: list[str]) -> dict[str, Any]:
    """--key value pairs -> dict with YAML-typed values (reference :17-44)."""
    out: dict[str, Any] = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument {tok!r}; overrides use --key value")
        key = tok[2:]
        if "=" in key:
            key, val = key.split("=", 1)
            out[key] = yaml.safe_load(val)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise SystemExit(f"missing value for --{key}")
            out[key] = yaml.safe_load(argv[i + 1])
            i += 2
    return out


def main(argv: list[str] | None = None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser("mga-train", add_help=True)
    parser.add_argument("--cfg", default=None, help="training YAML (reference schema)")
    args, rest = parser.parse_known_args(argv)
    overrides = parse_overrides(rest)

    from mga_yolo_tpu.train.trainer import train

    train(args.cfg, **overrides)


if __name__ == "__main__":
    main()
