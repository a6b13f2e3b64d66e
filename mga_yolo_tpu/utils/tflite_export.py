"""TFLite export of the jax model (no torch round-trip).

The reference ships deployment through the vendored Ultralytics exporter
(`external/ultralytics/ultralytics/engine/exporter.py`: ONNX / TFLite /
CoreML ...). This framework reaches that toolchain two ways:

* ``mga-ckpt export-torch`` (utils/torch_export.py) — weights into the
  reference's own MGAModel, from which its whole exporter family applies;
* ``mga-ckpt export-tflite`` (this module) — a DIRECT jax → TFLite
  flatbuffer via ``tf.lite.TFLiteConverter.experimental_from_jax``: the
  eval forward (decoded detections + per-scale mask logits) becomes a
  static-shape TFLite graph, optionally fp16- or dynamic-range-quantized.
  NMS stays host-side, matching the reference's default TFLite export
  (exporter.py exports the pre-NMS head unless ``nms=True``).

TensorFlow is imported lazily so the dependency stays optional.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np


def make_interpreter(model_path: Optional[str] = None,
                     model_content: Optional[bytes] = None):
    """TFLite interpreter with allocated tensors, falling back to the
    no-default-delegate resolver when XNNPACK refuses a node (observed on
    int8 static-range graphs: "Node ... (TfLiteXNNPackDelegate) failed to
    prepare")."""
    import tensorflow as tf

    kw = {"model_path": model_path} if model_path else {"model_content": model_content}
    interp = tf.lite.Interpreter(**kw)
    try:
        interp.allocate_tensors()
        return interp
    except RuntimeError:
        interp = tf.lite.Interpreter(
            **kw,
            experimental_op_resolver_type=(
                tf.lite.experimental.OpResolverType.BUILTIN_WITHOUT_DEFAULT_DELEGATES
            ),
        )
        interp.allocate_tensors()
        return interp


def _eval_forward(model, variables, split_decoded: bool = False):
    """(images) -> (decoded, p3, p4, p5) eval-mode closure over numpy weights.

    Input contract: **0-255 float32 BGR, letterboxed** — the /255
    normalization the training/predict paths apply on device
    (`train/state.py normalize_images`) is embedded in the exported graph,
    so deployment feeds raw pixel values (and int8 calibration sees the
    same domain the graph quantizes over).

    ``split_decoded=True`` returns ``(boxes, scores, p3, p4, p5)`` instead,
    with ``decoded = concat([boxes, scores], -1)``. Used by static-range
    int8 export: per-tensor quantization of the combined decode output puts
    box pixels (0..imgsz) and confidences (0..1) under ONE scale, crushing
    confidence resolution (measured mAP50 ~0, BASELINE.md export table);
    split outputs give each range its own scale.
    """
    # numpy-ify so the conversion never touches a (possibly remote) device
    import jax

    np_vars = jax.tree_util.tree_map(np.asarray, variables)

    def fwd(images):
        # MUL rather than DIV: quantized DIV nodes trap on zero denominators
        out = model.apply(np_vars, images * (1.0 / 255.0), train=False)
        decoded, _ = out["det"]
        seg = out["seg"]
        segs = tuple(seg[k] for k in sorted(seg))
        if split_decoded:
            return (decoded[..., :4], decoded[..., 4:]) + segs
        return (decoded,) + segs

    return fwd


def reassemble_decoded(outs: list, nc: Optional[int] = None) -> np.ndarray:
    """Rebuild the (B, A, 4+nc) decoded head from interpreter output arrays.

    Handles both export layouts: one 3-dim ``decoded`` output, or the int8
    split pair (boxes (B,A,4), scores (B,A,nc)). Disambiguation is by last
    dim == 4 for boxes; if nc == 4 makes that ambiguous, output order is
    used (boxes are returned first by ``_eval_forward``).
    """
    three = [np.asarray(o) for o in outs if np.asarray(o).ndim == 3]
    if len(three) == 1:
        return three[0]
    if len(three) != 2:
        raise ValueError(f"expected 1 or 2 rank-3 outputs, got {len(three)}")
    a, b = three
    if a.shape[-1] == 4 and b.shape[-1] != 4:
        boxes, scores = a, b
    elif b.shape[-1] == 4 and a.shape[-1] != 4:
        boxes, scores = b, a
    else:  # nc == 4: both rank-3 outputs have last dim 4 — trust order
        boxes, scores = a, b
    return np.concatenate([boxes, scores], axis=-1)


def _representative_gen(source, batch: int, size: int, n_max: int = 32):
    """Calibration-batch generator for int8 export.

    ``source``: a directory of images, a single image path, a list of image
    paths, or None (falls back to uniform-noise batches — functional but
    weak calibration; pass real images for deployment-grade scales). A
    source that yields no readable images is an error, not a silent noise
    fallback.
    """
    import cv2

    from mga_yolo_tpu.data.dataset import IMG_EXTS

    paths = []
    if source is not None:
        if isinstance(source, (list, tuple)):
            paths = [Path(q) for q in source]
        else:
            p = Path(source)
            if p.is_dir():
                paths = sorted(q for q in p.rglob("*") if q.suffix.lower() in IMG_EXTS)
            elif p.is_file():
                paths = [p]
            else:
                raise ValueError(f"int8 calibration source not found: {source}")
        if not paths:
            raise ValueError(f"no images under calibration source: {source}")
    paths = paths[:n_max]

    def gen():
        if not paths:
            rng = np.random.default_rng(0)
            for _ in range(8):
                yield [rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32)]
            return
        from mga_yolo_tpu.data.transforms import letterbox

        buf = []
        for q in paths:
            img = cv2.imread(str(q))
            if img is None:
                continue
            s = letterbox({"img": img, "cls": np.zeros((0,)),
                           "boxes": np.zeros((0, 4)), "mask": None},
                          (size, size), scaleup=False)
            buf.append(s["img"].astype(np.float32))
            if len(buf) == batch:
                yield [np.stack(buf)]
                buf = []
        if buf:  # pad the tail to the static batch
            while len(buf) < batch:
                buf.append(buf[-1])
            yield [np.stack(buf)]

    return gen


def decoded_output_details(interp) -> tuple[list, int]:
    """(rank-3 output details in concat order, nc) for a loaded interpreter.

    Returns ``([decoded], nc)`` for combined-layout artifacts and
    ``([boxes, scores], nc)`` for int8 split-layout ones; gathering the
    listed tensors and concatenating on the last axis always yields the
    (B, A, 4+nc) decoded head.
    """
    dets = [o for o in interp.get_output_details() if len(o["shape"]) == 3]
    if len(dets) == 1:
        return dets, int(dets[0]["shape"][-1]) - 4
    if len(dets) != 2:
        raise ValueError(f"expected 1 or 2 rank-3 outputs, got {len(dets)}")
    a, b = dets
    if int(b["shape"][-1]) == 4 and int(a["shape"][-1]) != 4:
        a, b = b, a  # boxes first; nc==4 ties fall back to output order
    return [a, b], int(b["shape"][-1])


def export_tflite(
    ckpt_path: str | Path,
    out_path: Optional[str | Path] = None,
    imgsz: Optional[int] = None,
    batch: int = 1,
    model_yaml: Optional[str] = None,
    scale: Optional[str] = None,
    quantize: Optional[str] = None,   # None | "fp16" | "dynamic" | "int8"
    verify: bool = True,
    representative: Optional[object] = None,  # int8: image dir/list for calibration
) -> dict:
    """Convert a checkpoint to a .tflite flatbuffer; returns an info dict.

    ``verify=True`` runs the flatbuffer through the TFLite interpreter on a
    random input and reports the max |Δ| of the decoded head vs the jax
    forward (fp32 export is numerically tight; quantized exports are looser
    by design).
    """
    import tensorflow as tf

    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

    # Pallas kernels do not lower through jax2tf — use the plain XLA path
    model, variables, meta = rebuild_from_checkpoint(
        ckpt_path, model_yaml, scale, use_pallas=False
    )
    size = int(imgsz or meta.get("imgsz", 640))
    fwd = _eval_forward(model, variables, split_decoded=quantize == "int8")
    example = np.zeros((batch, size, size, 3), np.float32)

    converter = tf.lite.TFLiteConverter.experimental_from_jax(
        [fwd], [[("images", example)]]
    )
    if quantize == "fp16":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        converter.target_spec.supported_types = [tf.float16]
    elif quantize == "dynamic":
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
    elif quantize == "int8":
        # Static-range int8, selectively quantized. Measured caveats on MGA
        # graphs (BASELINE.md export table) and their fixes: (a) quantized
        # DIV traps on the masked-pool eps denominator — DIV is denylisted
        # to float via the QuantizationDebugger; (b) a combined decode
        # output puts box pixels (0..imgsz) and confidences (0..1) under
        # one per-tensor scale, crushing confidence resolution (measured
        # mAP50 ~0) — the int8 graph therefore exports boxes and scores as
        # SEPARATE outputs (each with its own scale; consumers reassemble
        # via reassemble_decoded); (c) SOFTMAX is denylisted so the 16-bin
        # DFL distribution keeps float resolution through the box decode.
        # Box outputs still dequantize at imgsz/255 px resolution (~2.5 px
        # at 640) — validate with `mga-val --weights model.tflite`; use
        # --quantize dynamic when exact mAP at the smallest size is the goal.
        converter.optimizations = [tf.lite.Optimize.DEFAULT]
        rep = _representative_gen(representative, batch, size)
        converter.representative_dataset = rep
        dbg = tf.lite.experimental.QuantizationDebugger(
            converter=converter, debug_dataset=rep,
            debug_options=tf.lite.experimental.QuantizationDebugOptions(
                denylisted_ops=["DIV", "SOFTMAX"]
            ),
        )
        flatbuffer = dbg.get_nondebug_quantized_model()
    elif quantize:
        raise ValueError(f"unknown quantize mode {quantize!r} (fp16|dynamic|int8)")
    if quantize != "int8":
        flatbuffer = converter.convert()

    out = Path(out_path) if out_path else Path(str(ckpt_path)).with_suffix(".tflite")
    out = out.absolute()
    out.write_bytes(flatbuffer)
    info = {
        "path": str(out),
        "bytes": len(flatbuffer),
        "imgsz": size,
        "batch": batch,
        "quantize": quantize or "none",
        "outputs": None,
        "max_abs_diff_decoded": None,
    }

    if verify:
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 255, example.shape).astype(np.float32)
        ref = fwd(x)
        interp = make_interpreter(model_content=flatbuffer)
        (inp,) = interp.get_input_details()
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        outs = [interp.get_tensor(o["index"]) for o in interp.get_output_details()]
        info["outputs"] = [tuple(o.shape) for o in outs]
        # compare the (reassembled) decoded head; rank-3 outputs are the
        # decode tensors in both the combined and the int8 split layouts
        ref_dec = reassemble_decoded([np.asarray(r) for r in ref])
        dec = reassemble_decoded(outs)
        info["max_abs_diff_decoded"] = float(np.max(np.abs(dec - ref_dec)))
    return info


def export_saved_model(
    ckpt_path: str | Path,
    out_dir: str | Path,
    imgsz: Optional[int] = None,
    batch: int = 1,
    model_yaml: Optional[str] = None,
    scale: Optional[str] = None,
    verify: bool = True,
) -> dict:
    """Export the eval forward as a TF SavedModel (TF-Serving deployable).

    jax2tf native serialization: the jitted StableHLO runs under TF's
    XlaCallModule, so serving keeps XLA performance. Signature: ``f(images
    (B,S,S,3) float32) -> (decoded, p3, p4, p5)``.
    """
    import tensorflow as tf
    from jax.experimental import jax2tf

    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

    model, variables, meta = rebuild_from_checkpoint(
        ckpt_path, model_yaml, scale, use_pallas=False
    )
    size = int(imgsz or meta.get("imgsz", 640))
    fwd = _eval_forward(model, variables)
    module = tf.Module()
    module.f = tf.function(
        jax2tf.convert(fwd, with_gradient=False),
        autograph=False,
        input_signature=[tf.TensorSpec((batch, size, size, 3), tf.float32)],
    )
    out_dir = Path(out_dir).absolute()
    tf.saved_model.save(module, str(out_dir))
    info = {"path": str(out_dir), "imgsz": size, "batch": batch,
            "outputs": None, "max_abs_diff_decoded": None}
    if verify:
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 255, (batch, size, size, 3)).astype(np.float32)
        loaded = tf.saved_model.load(str(out_dir))
        got = loaded.f(tf.constant(x))
        ref = fwd(x)
        info["outputs"] = [tuple(g.shape) for g in got]
        info["max_abs_diff_decoded"] = float(
            np.max(np.abs(got[0].numpy() - np.asarray(ref[0])))
        )
    return info
