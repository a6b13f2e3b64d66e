"""Run-directory increment semantics + results.csv resume truncation.

Reference: `increment_path` (`utils/files.py:108`) and `get_save_dir`
(`cfg/__init__.py:388`) — name collisions get numeric suffixes; resume
continues in place without duplicate epoch rows.
"""

from mga_yolo_tpu.utils.csvlog import ResultsCSV
from mga_yolo_tpu.utils.files import increment_path, resolve_save_dir


def test_increment_path(tmp_path):
    p = tmp_path / "train"
    assert increment_path(p) == p
    p.mkdir()
    assert increment_path(p) == tmp_path / "train2"
    (tmp_path / "train2").mkdir()
    assert increment_path(p) == tmp_path / "train3"
    assert increment_path(p, exist_ok=True) == p


def test_resolve_save_dir_resume_in_place(tmp_path):
    base = tmp_path / "runs" / "t"
    base.mkdir(parents=True)
    assert resolve_save_dir(tmp_path / "runs", "t", resume=True) == base
    assert resolve_save_dir(tmp_path / "runs", "t") == tmp_path / "runs" / "t2"


def test_csv_truncate_after_epoch(tmp_path):
    csv = ResultsCSV(tmp_path)
    for e in range(1, 6):
        csv.append({"epoch": float(e), "train/det/total": float(e) * 0.1})
    # resume from start_epoch=3 -> rows 4,5 must go (they'll be re-run)
    csv2 = ResultsCSV(tmp_path)
    csv2.truncate_after_epoch(3)
    lines = (tmp_path / "results.csv").read_text().strip().splitlines()
    assert len(lines) == 1 + 3  # header + epochs 1..3
    csv2.append({"epoch": 4.0, "train/det/total": 0.9})
    lines = (tmp_path / "results.csv").read_text().strip().splitlines()
    assert len(lines) == 1 + 4
    epochs = [float(l.split(",")[0]) for l in lines[1:]]
    assert epochs == [1.0, 2.0, 3.0, 4.0]
