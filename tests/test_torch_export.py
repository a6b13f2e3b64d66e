"""Torch-reference weight EXPORT parity (inverse of test_forward_parity).

A TPU-side variable tree exports to a reference-keyed state_dict that (a)
loads into the torch reference MGAModel with ``strict=True`` — proving the
key surface is exact, DFL included — and (b) produces identical forwards.
A second test round-trips through the reference's own minimal-checkpoint
loader (`/root/reference/mga_yolo/model/checkpoint.py:19`), which is the
documented gateway to the torch deployment toolchain (ONNX/TFLite).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import jax
import jax.numpy as jnp

from tests._reference_oracle import setup_reference_paths

setup_reference_paths()

from mga_yolo_tpu.models.yolo import create_model
from mga_yolo_tpu.utils.torch_export import (
    export_torch_state_dict,
    save_reference_checkpoint,
)
from mga_yolo_tpu.utils.torch_import import import_torch_state_dict, merge_imported


def _init_variables(model, seed=3):
    x = np.random.default_rng(seed).random((1, 64, 64, 3)).astype(np.float32)
    v = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(seed), jnp.asarray(x)
    )
    return v, x


@pytest.mark.parametrize("variant", ["cbam", "eca", "spade"])
def test_export_strict_load_and_forward_parity(variant):
    from mga_yolo.model.model import MGAModel as TorchMGA

    model, spec = create_model(f"configs/models/yolov8_{variant}.yaml", scale="n", nc=1)
    variables, x_np = _init_variables(model)

    sd = export_torch_state_dict(variables, spec)
    tmodel = TorchMGA(
        f"/root/reference/configs/models/yolov8_{variant}.yaml", ch=3, nc=1, verbose=False
    )
    tmodel.eval().float()
    tmodel.return_dict = True
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, f"exported keys unknown to the reference: {unexpected[:10]}"
    real_missing = [k for k in missing if "num_batches_tracked" not in k]
    assert not real_missing, f"reference keys we failed to export: {real_missing[:10]}"

    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    ours = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, jnp.asarray(x_np))

    for sk in ("p3", "p4", "p5"):
        t_seg = tout["seg"][sk].numpy()
        o_seg = np.transpose(np.asarray(ours["seg"][sk]), (0, 3, 1, 2))
        np.testing.assert_allclose(o_seg, t_seg, rtol=1e-3, atol=1e-4, err_msg=f"seg {sk}")
    t_decoded = tout["det"][0].numpy()
    o_dec = np.transpose(np.asarray(ours["det"][0]), (0, 2, 1))
    np.testing.assert_allclose(o_dec, t_decoded, rtol=1e-3, atol=2e-3, err_msg="decoded")


def test_export_import_roundtrip_exact():
    """export -> import must reproduce the original tree bit-for-bit."""
    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    variables, _ = _init_variables(model)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_torch_state_dict(variables, spec).items()}
    params, stats, skipped = import_torch_state_dict(sd, spec)
    real_skipped = [k for k in skipped if "num_batches_tracked" not in k]
    assert not real_skipped, real_skipped[:10]
    merged = merge_imported(variables, params, stats)

    flat0 = jax.tree_util.tree_leaves_with_path(variables)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(merged))
    assert len(flat0) == len(flat1)
    for path, leaf in flat0:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat1[path]),
                                      err_msg=jax.tree_util.keystr(path))


def test_reference_minimal_ckpt_loader_accepts_export(tmp_path):
    """The reference's own loader must rebuild a working torch model from our
    exported .pt (deployment-toolchain gateway)."""
    from mga_yolo.model.checkpoint import rebuild_mga_model_from_minimal_ckpt

    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    variables, x_np = _init_variables(model)
    out = tmp_path / "export.pt"
    save_reference_checkpoint(variables, spec, out, nc=1)

    tmodel, ckpt = rebuild_mga_model_from_minimal_ckpt(
        out, "/root/reference/configs/models/yolov8_cbam.yaml"
    )
    tmodel.eval().float()
    tmodel.return_dict = True
    assert ckpt["train_args"]["nc"] == 1
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2))))
    ours = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, jnp.asarray(x_np))
    t_decoded = tout["det"][0].numpy()
    o_dec = np.transpose(np.asarray(ours["det"][0]), (0, 2, 1))
    np.testing.assert_allclose(o_dec, t_decoded, rtol=1e-3, atol=2e-3)
