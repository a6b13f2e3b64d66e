"""Per-layer profiler: params add up, FLOPs are present for compute nodes."""

import jax
import numpy as np


def test_profile_layers_totals():
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.utils.layer_profile import format_table, profile_layers

    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )
    rows = profile_layers(model, dict(variables), imgsz=64)

    assert len(rows) == len(spec.nodes)
    total = sum(r["params"] for r in rows)
    expected = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
    )
    assert total == expected, "per-layer params must sum to the model total"

    by_mod = {r["module"]: r for r in rows}
    # conv-bearing nodes report FLOPs; inline ops report zero
    assert by_mod["Conv"]["gflops"] and by_mod["Conv"]["gflops"] > 0
    assert by_mod["Upsample"]["gflops"] == 0.0
    assert by_mod["Concat"]["gflops"] == 0.0
    assert by_mod["Detect"]["gflops"] and by_mod["Detect"]["gflops"] > 0
    # strides follow the pyramid
    det = [r for r in rows if r["module"] == "Detect"][0]
    assert det["stride"] in (8, 16, 32)

    table = format_table(rows)
    assert "TOTAL" in table and "Conv" in table
