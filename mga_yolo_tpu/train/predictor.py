"""Inference API: images -> detection Results with attached MGA masks.

Re-implements the reference predict path (`YOLO.predict` ->
`BasePredictor.stream_inference` -> `MGAPredictor.postprocess`,
`/root/reference/mga_yolo/model/predictor.py:7-24`): letterbox preprocess,
jitted batched forward, NMS, box rescale to original image coords, and the
per-image seg logits attached as ``Results.mga_masks`` {p3,p4,p5}.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Sequence

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from mga_yolo_tpu.data.transforms import letterbox
from mga_yolo_tpu.ops.nms import nms_numpy


@dataclasses.dataclass
class Results:
    """Per-image prediction container (subset of the reference Results API)."""

    path: str
    orig_shape: tuple[int, int]
    boxes: np.ndarray            # (N, 6) [x1, y1, x2, y2, conf, cls] in ORIGINAL coords
    mga_masks: Dict[str, np.ndarray]  # {"p3","p4","p5"}: (h, w) sigmoid probs

    def __len__(self) -> int:
        return len(self.boxes)

    def plot(self, img: Optional[np.ndarray] = None) -> np.ndarray:
        im = img if img is not None else cv2.imread(self.path)
        for x1, y1, x2, y2, conf, c in self.boxes:
            cv2.rectangle(im, (int(x1), int(y1)), (int(x2), int(y2)), (0, 255, 0), 2)
            cv2.putText(
                im, f"{int(c)}:{conf:.2f}", (int(x1), max(0, int(y1) - 4)),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1,
            )
        return im


def scale_boxes(boxes: np.ndarray, ratio_pad, orig_shape) -> np.ndarray:
    """Letterboxed coords -> original image coords (reference ops.py:105)."""
    r, (left, top) = ratio_pad
    out = boxes.copy()
    out[:, [0, 2]] = (out[:, [0, 2]] - left) / r
    out[:, [1, 3]] = (out[:, [1, 3]] - top) / r
    out[:, [0, 2]] = out[:, [0, 2]].clip(0, orig_shape[1])
    out[:, [1, 3]] = out[:, [1, 3]].clip(0, orig_shape[0])
    return out


class MGAPredictor:
    def __init__(
        self,
        model,
        variables,
        imgsz: int = 640,
        conf: float = 0.25,
        iou: float = 0.45,
        max_det: int = 300,
        dtype=jnp.float32,
        fuse: bool = False,
    ):
        if fuse:
            # BN-fold for inference (reference model.fuse())
            from mga_yolo_tpu.utils.model_utils import fuse_variables

            variables = fuse_variables(variables)
        self.model = model
        self.imgsz = imgsz
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self.dtype = dtype
        self.variables = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a, variables
        )
        self._forward = jax.jit(self._fwd)

    def _fwd(self, v, x):
        out = self.model.apply(v, x.astype(self.dtype) / 255.0, train=False)
        decoded, _ = out["det"]
        return decoded, out["seg"]

    def forward_batch(self, x_np: np.ndarray):
        """(B,S,S,3) uint8 0-255 -> (decoded np, {scale: seg logits np})."""
        decoded, seg = self._forward(self.variables, jnp.asarray(x_np))
        return (np.asarray(decoded, np.float32),
                {k: np.asarray(v, np.float32) for k, v in seg.items()})

    def _infer_batch(self, imgs: list, metas: list, batch_size: int) -> List[Results]:
        """Forward one (possibly tail-padded) batch and postprocess each row.

        Padding partial batches to ``batch_size`` keeps the jitted forward on
        ONE compiled shape — a fresh per-shape compile is expensive on the
        remote-compile TPU tunnel; padded rows are dropped after the forward.
        """
        n_real = len(imgs)
        if n_real < batch_size:
            imgs = imgs + [imgs[-1]] * (batch_size - n_real)
        decoded, seg_np = self.forward_batch(np.stack(imgs))
        out: List[Results] = []
        for i, (path, orig_shape, ratio_pad) in enumerate(metas):
            dets = nms_numpy(decoded[i], self.conf, self.iou, self.max_det)
            dets[:, :4] = scale_boxes(dets[:, :4], ratio_pad, orig_shape)
            masks = {k: 1.0 / (1.0 + np.exp(-seg_np[k][i, ..., 0])) for k in seg_np}
            out.append(Results(path, orig_shape, dets, masks))
        return out

    def stream(self, source, batch_size: int = 16, max_frames: int = 0):
        """Streaming inference over any source kind — yields (Frame, Results).

        Mirrors the reference `BasePredictor.stream_inference`
        (`engine/predictor.py:277`): frames arrive from
        :func:`mga_yolo_tpu.data.sources.iter_source` (image files, dirs,
        globs, video files, webcams, stream URLs), are letterboxed on host,
        batched to the fixed compiled shape, and results stream out in frame
        order without buffering the whole video.
        """
        from mga_yolo_tpu.data.sources import Frame, iter_source

        pending_frames: list = []
        imgs, metas = [], []
        full_seen = False  # a full-size batch has been compiled already

        def flush():
            # Pad the tail to the compiled shape only once that shape exists;
            # a small source (fewer frames than batch_size) runs ONE exact-size
            # forward instead of padding 1 frame to 16 (same policy as
            # __call__'s `len(items) > batch_size` condition).
            bs = batch_size if full_seen else len(imgs)
            results = self._infer_batch(imgs, metas, bs)
            for fr, r in zip(pending_frames, results):
                yield fr, r
            pending_frames.clear()
            imgs.clear()
            metas.clear()

        for frame in iter_source(source, max_frames=max_frames):
            lb = letterbox({"img": frame.img, "boxes": np.zeros((0, 4), np.float32),
                            "cls": np.zeros((0,), np.float32)}, self.imgsz, scaleup=False)
            pending_frames.append(frame)
            imgs.append(lb["img"])
            metas.append((frame.path, frame.img.shape[:2], lb["ratio_pad"]))
            if len(imgs) == batch_size:
                yield from flush()
                full_seen = True
        if imgs:
            yield from flush()

    def __call__(self, sources: Iterable[str | np.ndarray], batch_size: int = 16) -> List[Results]:
        items = list(sources)
        results: List[Results] = []
        for start in range(0, len(items), batch_size):
            chunk = items[start : start + batch_size]
            imgs, metas = [], []
            for src in chunk:
                if isinstance(src, (str, Path)):
                    img = cv2.imread(str(src))
                    path = str(src)
                else:
                    img, path = src, "<array>"
                lb = letterbox({"img": img, "boxes": np.zeros((0, 4), np.float32),
                                "cls": np.zeros((0,), np.float32)}, self.imgsz, scaleup=False)
                imgs.append(lb["img"])
                metas.append((path, img.shape[:2], lb["ratio_pad"]))
            bs = batch_size if len(items) > batch_size else len(imgs)
            results.extend(self._infer_batch(imgs, metas, bs))
        return results


class TFLitePredictor(MGAPredictor):
    """Predictor over an exported .tflite artifact (mga-ckpt export-tflite).

    Same stream/__call__/postprocess surface as MGAPredictor; the forward is
    the TFLite interpreter run at the flatbuffer's baked batch (chunked +
    tail-padded host-side — see cli/val.py for why resize is unsafe). The
    exported graph embeds the /255 normalize, so it consumes the same 0-255
    letterboxed uint8 pixels as the jax path.
    """

    def __init__(self, tflite_path: str | Path, imgsz: Optional[int] = None,
                 conf: float = 0.25, iou: float = 0.45, max_det: int = 300, **_ignored):
        from mga_yolo_tpu.utils.tflite_export import make_interpreter

        self._interp = make_interpreter(model_path=str(tflite_path))
        self._inp = self._interp.get_input_details()[0]
        self._fixed_b = int(self._inp["shape"][0])
        self.imgsz = imgsz or int(self._inp["shape"][1])
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        outs = self._interp.get_output_details()
        # combined layout has one rank-3 decoded output; int8 split layout
        # has (boxes, scores) — concat on the last axis rebuilds decoded
        from mga_yolo_tpu.utils.tflite_export import decoded_output_details

        self._dec_outs, _ = decoded_output_details(self._interp)
        # seg maps are the 4-dim outputs; name them by their stride
        self._seg_outs = {}
        for o in outs:
            if len(o["shape"]) == 4:
                stride = self.imgsz // int(o["shape"][1])
                self._seg_outs[f"p{int(np.log2(stride))}"] = o

    def forward_batch(self, x_np: np.ndarray):
        x = np.asarray(x_np, np.float32)
        dec, segs = [], {k: [] for k in self._seg_outs}
        for i in range(0, x.shape[0], self._fixed_b):
            chunk = x[i : i + self._fixed_b]
            pad = self._fixed_b - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            self._interp.set_tensor(self._inp["index"], chunk)
            self._interp.invoke()
            keep = self._fixed_b - pad or None
            parts = [self._interp.get_tensor(o["index"])[:keep] for o in self._dec_outs]
            dec.append(parts[0] if len(parts) == 1 else np.concatenate(parts, axis=-1))
            for k, o in self._seg_outs.items():
                segs[k].append(self._interp.get_tensor(o["index"])[:keep])
        return (np.concatenate(dec).astype(np.float32),
                {k: np.concatenate(v).astype(np.float32) for k, v in segs.items()})


def load_predictor(
    ckpt_path: str | Path,
    model_yaml: Optional[str] = None,
    scale: Optional[str] = None,
    imgsz: Optional[int] = None,
    use_pallas: "bool | str | None" = "auto",
    **kw,
) -> MGAPredictor:
    if str(ckpt_path).endswith(".tflite"):
        return TFLitePredictor(ckpt_path, imgsz=imgsz, **kw)
    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint

    model, variables, meta = rebuild_from_checkpoint(ckpt_path, model_yaml, scale,
                                                     use_pallas=use_pallas)
    return MGAPredictor(model, variables, imgsz=imgsz or int(meta.get("imgsz", 640)), **kw)
