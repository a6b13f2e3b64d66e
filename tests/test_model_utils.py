"""BN-fold fusion equivalence + model_info (reference model.fuse()/info())."""

import jax
import jax.numpy as jnp
import numpy as np

from mga_yolo_tpu.graph import parse_graph
from mga_yolo_tpu.models.yolo import create_model
from mga_yolo_tpu.utils.model_utils import fuse_variables, model_info


def test_fuse_equivalence():
    model, _ = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)), jnp.float32)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(jax.random.PRNGKey(0), x)

    # make running stats non-trivial so the fold actually does something
    def perturb(tree, key=0):
        rng = np.random.default_rng(key)

        def f(path, leaf):
            name = str(path[-1])
            if "mean" in name:
                return leaf + jnp.asarray(rng.normal(0, 0.3, leaf.shape), leaf.dtype)
            if "var" in name:
                return leaf * jnp.asarray(rng.uniform(0.5, 2.0, leaf.shape), leaf.dtype)
            return leaf

        return jax.tree_util.tree_map_with_path(f, tree)

    variables = {"params": variables["params"], "batch_stats": perturb(variables["batch_stats"])}

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False)["det"][0])
    ref = np.asarray(fwd(variables, x))
    fused = fuse_variables(variables)
    got = np.asarray(fwd(fused, x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_model_info():
    spec = parse_graph("configs/models/yolov8_cbam.yaml", scale="n")
    info = model_info(spec)
    assert info["n_layers"] == 29
    assert info["detect_strides"] == [8, 16, 32]
    assert info["layers"][22]["module"] == "MGAMaskHead"
    assert info["layers"][9]["module"] == "SPPF"
