"""Publication plotting suite consuming results.csv / profiling.yaml.

Capability port of the reference analysis layer
(`/root/reference/mga_yolo/utils/plotting/model_comparison.py` (617 LoC),
`pareto_performance_size.py` (546 LoC), `mask_showcase_ds.py`, and the
fork-rewritten `plot_results` in vendored `utils/plotting.py:860-1200`):

* :func:`plot_results`       — per-run training-curve figure, Gaussian smoothing
* :func:`model_comparison`   — N-run det-loss grid / seg-loss grid / val-metric panel
* :func:`pareto_performance` — mAP-vs-model-size Pareto front from results.csv + profiling.yaml
* :func:`mask_showcase`      — side-by-side panels of the mask-downsampling methods

All functions consume the same results.csv schema the trainer writes
(`mga_yolo_tpu.utils.csvlog`), so reference plotting workflows port directly.
"""

from mga_yolo_tpu.utils.plotting.results import (
    feature_visualization,
    gumbel_tau_sweep,
    mask_showcase,
    model_comparison,
    pareto_performance,
    plot_confusion_matrix,
    plot_mc_curve,
    plot_pr_curve,
    plot_results,
)

__all__ = [
    "plot_results",
    "model_comparison",
    "pareto_performance",
    "mask_showcase",
    "feature_visualization",
    "gumbel_tau_sweep",
    "plot_pr_curve",
    "plot_mc_curve",
    "plot_confusion_matrix",
]
