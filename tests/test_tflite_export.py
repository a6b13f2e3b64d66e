"""Direct jax -> TFLite export (utils/tflite_export.py).

Converts a mini-graph checkpoint to a .tflite flatbuffer and checks the
interpreter reproduces the jax eval forward (decoded head) to fp32
tolerance — the deployment artifact the reference produces through its
Ultralytics exporter (engine/exporter.py TFLite path), here without any
torch round-trip.
"""

import numpy as np
import pytest
import yaml

tf = pytest.importorskip("tensorflow")

import jax

from mga_yolo_tpu.models.yolo import create_model
from mga_yolo_tpu.train.state import create_train_state
from mga_yolo_tpu.utils.checkpoint import save_checkpoint
from mga_yolo_tpu.utils.tflite_export import export_tflite
from tests.test_remat import MINI_CFG


def test_export_tflite_roundtrip(tmp_path):
    model, spec = create_model(dict(MINI_CFG), scale="n", nc=1, use_pallas=False)
    state = create_train_state(model, jax.random.PRNGKey(0), imgsz=64)
    ckpt = tmp_path / "mini_ckpt"
    save_checkpoint(ckpt, state, {
        "model_yaml": str(tmp_path / "missing.yaml"),  # exercise the embedded-text fallback
        "model_yaml_text": yaml.safe_dump(MINI_CFG),
        "model_scale": "n", "nc": 1, "imgsz": 64, "optimizer": "sgd",
    })

    info = export_tflite(ckpt, tmp_path / "mini.tflite", imgsz=64, verify=True)
    assert (tmp_path / "mini.tflite").exists()
    assert info["bytes"] > 1000
    # decoded head (1, 4+nc, A) reproduced by the interpreter
    assert info["max_abs_diff_decoded"] < 1e-3
    # decoded + one mask logit map per scale
    assert len(info["outputs"]) == 1 + len(spec.mask_head_indices)

    from mga_yolo_tpu.utils.tflite_export import export_saved_model

    sm = export_saved_model(ckpt, tmp_path / "sm", imgsz=64, verify=True)
    assert (tmp_path / "sm" / "saved_model.pb").exists()
    assert sm["max_abs_diff_decoded"] < 1e-3
    assert len(sm["outputs"]) == 1 + len(spec.mask_head_indices)


def test_export_tflite_int8_split_layout(tmp_path):
    """int8 static export splits boxes/scores so each gets its own scale
    (combined layout measured mAP50 ~0 — BASELINE.md export table); the
    consumer-side helpers must reassemble the decoded head."""
    model, spec = create_model(dict(MINI_CFG), scale="n", nc=1, use_pallas=False)
    state = create_train_state(model, jax.random.PRNGKey(0), imgsz=64)
    ckpt = tmp_path / "mini_ckpt"
    save_checkpoint(ckpt, state, {
        "model_yaml_text": yaml.safe_dump(MINI_CFG),
        "model_scale": "n", "nc": 1, "imgsz": 64, "optimizer": "sgd",
    })

    info = export_tflite(ckpt, tmp_path / "mini_int8.tflite", imgsz=64,
                         quantize="int8", verify=True)
    # boxes + scores + one mask logit map per scale
    assert len(info["outputs"]) == 2 + len(spec.mask_head_indices)
    shapes3 = [s for s in info["outputs"] if len(s) == 3]
    assert sorted(s[-1] for s in shapes3) == [1, 4]  # scores (nc=1) + boxes (4)

    from mga_yolo_tpu.utils.tflite_export import (
        decoded_output_details, make_interpreter,
    )

    interp = make_interpreter(model_path=str(tmp_path / "mini_int8.tflite"))
    dec_outs, nc = decoded_output_details(interp)
    assert nc == 1
    assert len(dec_outs) == 2
    assert int(dec_outs[0]["shape"][-1]) == 4  # boxes first
    # int8 quantization is lossy but the decoded head must stay in-range
    assert info["max_abs_diff_decoded"] < 64.0

    # the predictor reassembles the split layout transparently
    from mga_yolo_tpu.train.predictor import TFLitePredictor

    pred = TFLitePredictor(tmp_path / "mini_int8.tflite", imgsz=64, conf=0.0)
    dec, segs = pred.forward_batch(np.zeros((1, 64, 64, 3), np.float32))
    assert dec.shape[-1] == 4 + nc
    assert len(segs) == len(spec.mask_head_indices)


def test_representative_gen_validates_source(tmp_path):
    from mga_yolo_tpu.utils.tflite_export import _representative_gen

    with pytest.raises(ValueError, match="not found"):
        _representative_gen(tmp_path / "nope", 1, 64)
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no images"):
        _representative_gen(tmp_path / "empty", 1, 64)
    # None -> noise fallback generator, no error
    gen = _representative_gen(None, 2, 64)
    (first,) = next(gen())
    assert first.shape == (2, 64, 64, 3)
