"""Plotting suite smoke tests on synthetic results.csv
(mirrors reference tests/test_plot_results.py — Agg backend, synthetic schema)."""

import numpy as np
import pytest
import yaml

from mga_yolo_tpu.utils.csvlog import HEADER_ORDER, ResultsCSV


def _synthetic_results(path, epochs=12, seed=0):
    rng = np.random.default_rng(seed)
    csv = ResultsCSV(path)
    for e in range(epochs):
        row = {"epoch": float(e + 1)}
        decay = np.exp(-e / 6)
        for col in HEADER_ORDER[1:]:
            row[col] = float(decay * rng.uniform(0.5, 2.0))
        row["metrics/precision(B)"] = float(1 - decay * 0.5)
        row["metrics/recall(B)"] = float(1 - decay * 0.6)
        row["metrics/mAP50(B)"] = float(1 - decay * 0.7)
        row["metrics/mAP50-95(B)"] = float(1 - decay * 0.8)
        row["alpha_P3"] = 0.69
        csv.append(row)
    return csv.path


def test_plot_results(tmp_path):
    from mga_yolo_tpu.utils.plotting import plot_results

    csv_path = _synthetic_results(tmp_path)
    out = plot_results(csv_path)
    assert out.exists() and out.stat().st_size > 1000


def test_model_comparison(tmp_path):
    from mga_yolo_tpu.utils.plotting import model_comparison

    a = _synthetic_results(tmp_path / "a", seed=1)
    b = _synthetic_results(tmp_path / "b", seed=2)
    outs = model_comparison({"cbam": a, "eca": b}, tmp_path / "cmp")
    assert len(outs) == 3 and all(o.exists() for o in outs)


def test_pareto(tmp_path):
    from mga_yolo_tpu.utils.plotting import pareto_performance

    runs = []
    for i, name in enumerate(["n", "s"]):
        csvp = _synthetic_results(tmp_path / name, seed=i)
        prof = tmp_path / name / "profiling.yaml"
        prof.write_text(yaml.safe_dump({"parameters": (i + 1) * 3_000_000}))
        runs.append({"name": name, "results_csv": csvp, "profiling_yaml": prof})
    out = pareto_performance(runs, tmp_path / "pareto.png")
    assert out.exists()


def test_mask_showcase(tmp_path):
    from mga_yolo_tpu.utils.plotting import mask_showcase

    m = np.zeros((128, 128), np.uint8)
    m[30:90, 60:64] = 1  # thin vertical vessel
    out = mask_showcase(m, tmp_path / "showcase.png")
    assert out.exists()


def _two_fold_grid(tmp_path):
    """Synthetic 2-fold x 2-model grid (VERDICT r2 next #7 done-criterion)."""
    runs = []
    for i, model in enumerate(["cbam_n", "eca_n"]):
        for fold in range(2):
            name = f"{model}_fold{fold}"
            csvp = _synthetic_results(tmp_path / name, seed=10 * i + fold)
            prof = tmp_path / name / "profiling.yaml"
            prof.write_text(yaml.safe_dump({"parameters": (i + 1) * 3_000_000}))
            runs.append({"name": name, "results_csv": csvp, "profiling_yaml": prof,
                         "group": model.split("_")[0]})
    return runs


def test_strip_fold():
    from mga_yolo_tpu.utils.plotting.results import strip_fold

    assert strip_fold("cbam_n_fold2") == "cbam_n"
    assert strip_fold("cbam_n-fold_13") == "cbam_n"
    assert strip_fold("cbam_n") == "cbam_n"


def test_pareto_fold_aggregation(tmp_path):
    """k-fold repeats collapse to one mean point with std whiskers
    (reference pareto_performance_size.py:28-34,95-97)."""
    from mga_yolo_tpu.utils.plotting import pareto_performance

    runs = _two_fold_grid(tmp_path)
    out = pareto_performance(runs, tmp_path / "pareto_folds.png")
    assert out.exists() and out.stat().st_size > 1000
    # non-aggregated still works (4 separate points)
    out2 = pareto_performance(runs, tmp_path / "pareto_raw.png", aggregate_folds=False)
    assert out2.exists()


def test_model_comparison_fold_bands(tmp_path):
    from mga_yolo_tpu.utils.plotting import model_comparison

    runs = {f"{m}_fold{f}": _synthetic_results(tmp_path / f"{m}{f}", seed=3 * f + hash(m) % 5)
            for m in ("cbam_n", "eca_n") for f in range(2)}
    outs = model_comparison(runs, tmp_path / "cmp_folds", fold_bands=True)
    assert len(outs) == 3 and all(o.exists() for o in outs)


def test_mask_showcase_precomputed(tmp_path):
    """Reference mask_showcase_precomputed.py contract: method dirs with
    *_p{3,4,5}.png in, one panel PNG per level out."""
    from PIL import Image

    from mga_yolo_tpu.utils.plotting.results import mask_showcase_precomputed

    rng = np.random.default_rng(0)
    for meth in ("nearest", "maxpool"):
        d = tmp_path / "in" / meth
        d.mkdir(parents=True)
        for lvl, size in (("p3", 16), ("p4", 8), ("p5", 4)):
            img = (rng.random((size, size)) > 0.5).astype(np.uint8) * 255
            Image.fromarray(img).save(d / f"x_{lvl}.png")
    outs = mask_showcase_precomputed(tmp_path / "in", tmp_path / "out")
    assert [o.name for o in outs] == ["showcase_p3.png", "showcase_p4.png", "showcase_p5.png"]
    assert all(o.stat().st_size > 0 for o in outs)
