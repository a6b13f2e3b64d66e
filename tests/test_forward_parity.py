"""Full-model forward parity vs the torch reference.

The reference MGAModel is instantiated with random init, its state_dict is
imported through `mga_yolo_tpu.utils.torch_import`, and both frameworks run
the same input — raw detection maps, seg logits, and decoded outputs must
match. This pins the entire wiring: conv geometry/padding, block structure,
attention numerics, DFL decode (BASELINE.json: "bit-comparable attention
maps and mAP parity").
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from tests._reference_oracle import setup_reference_paths

setup_reference_paths()

from mga_yolo_tpu.models.yolo import create_model
from mga_yolo_tpu.utils.torch_import import import_torch_state_dict, merge_imported

VARIANTS = ["cbam", "eca", "spade"]


@pytest.mark.parametrize("variant", VARIANTS)
def test_forward_parity(variant):
    from mga_yolo.model.model import MGAModel as TorchMGA

    tmodel = TorchMGA(f"/root/reference/configs/models/yolov8_{variant}.yaml", ch=3, nc=1, verbose=False)
    tmodel.eval().float()
    tmodel.return_dict = True

    model, spec = create_model(f"configs/models/yolov8_{variant}.yaml", scale="n", nc=1)
    x_np = np.random.default_rng(0).random((1, 64, 64, 3)).astype(np.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(x_np)
    )

    params, stats, skipped = import_torch_state_dict(tmodel.state_dict(), spec)
    real_skipped = [k for k in skipped if "num_batches_tracked" not in k]
    assert not real_skipped, f"unmapped torch keys: {real_skipped[:10]}"
    variables = merge_imported(variables, params, stats)

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    ours = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, jnp.asarray(x_np))

    # --- seg logits (the attention inputs -> "bit-comparable masks") ---
    for sk in ("p3", "p4", "p5"):
        t_seg = tout["seg"][sk].numpy()                      # (B,1,h,w)
        o_seg = np.transpose(np.asarray(ours["seg"][sk]), (0, 3, 1, 2))
        np.testing.assert_allclose(o_seg, t_seg, rtol=1e-3, atol=1e-4, err_msg=f"seg {sk}")

    # --- raw detection maps ---
    t_maps = tout["det"][1]
    o_decoded, o_maps = ours["det"]
    for lvl, (tm, om) in enumerate(zip(t_maps, o_maps)):
        om_t = np.transpose(np.asarray(om), (0, 3, 1, 2))
        np.testing.assert_allclose(
            om_t, tm.numpy(), rtol=1e-3, atol=1e-3, err_msg=f"det map level {lvl}"
        )

    # --- decoded predictions ---
    t_decoded = tout["det"][0].numpy()                       # (B, 4+nc, A)
    o_dec = np.transpose(np.asarray(o_decoded), (0, 2, 1))   # -> (B, 4+nc, A)
    np.testing.assert_allclose(o_dec, t_decoded, rtol=1e-3, atol=2e-3, err_msg="decoded")
