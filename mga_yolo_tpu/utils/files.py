"""Run-directory management.

Mirrors the reference `increment_path` / `get_save_dir`
(`/root/reference/mga_yolo/external/ultralytics/ultralytics/utils/files.py:108`,
`cfg/__init__.py:388`): a second run named ``train`` lands in ``train2``,
then ``train3`` …, unless ``exist_ok`` (reuse) or ``resume`` (continue in
place) is set.
"""

from __future__ import annotations

from pathlib import Path


def increment_path(path: str | Path, exist_ok: bool = False, sep: str = "") -> Path:
    """Return ``path`` unchanged if free (or exist_ok), else ``path{sep}2``…"""
    path = Path(path)
    if exist_ok or not path.exists():
        return path
    for n in range(2, 9999):
        cand = Path(f"{path}{sep}{n}")
        if not cand.exists():
            return cand
    raise RuntimeError(f"could not find a free run dir for {path}")


def resolve_save_dir(project: str | Path, name: str, exist_ok: bool = False,
                     resume: bool = False) -> Path:
    """Reference get_save_dir semantics: resume continues in the existing dir."""
    base = Path(project) / name
    if resume:
        return base
    return increment_path(base, exist_ok=exist_ok)
