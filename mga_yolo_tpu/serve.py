"""Production serving surface: micro-batched TPU inference + HTTP server.

The reference ships deployment *examples* only (C++/Rust ONNX apps under
`/root/reference/mga_yolo/external/ultralytics/examples/`, not part of the
runtime — SURVEY.md §2.9). For a TPU-native framework the natural serving
path is the jitted forward itself: one fixed-shape compiled program (forward
+ DFL decode + device NMS) executed at a fixed micro-batch size, fed by a
request-coalescing queue.

Design notes (TPU):
* **Static shapes.** The engine compiles ONE program at ``(batch, imgsz,
  imgsz, 3)``; short micro-batches are padded to ``batch`` and the padded
  rows dropped host-side. No per-request recompiles ever.
* **Micro-batching.** Requests wait at most ``max_wait_ms`` for peers; a
  full batch dispatches immediately. This trades a bounded latency floor for
  MXU utilization — the standard TPU serving recipe.
* **Device NMS.** Suppression runs inside the jitted program
  (`ops/nms.py nms_jax`), so the host only letterboxes and rescales boxes.
* **Threading.** One dispatcher thread owns the device; HTTP handler threads
  only enqueue and wait on a per-request event, so the GIL never serializes
  device dispatch with request parsing.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

MAX_UPLOAD_BYTES = 32 * 1024 * 1024  # reject absurd uploads with 413 instead of OOM


# --------------------------------------------------------------------- engine


@dataclasses.dataclass
class Prediction:
    boxes: np.ndarray                 # (N, 6) [x1,y1,x2,y2,conf,cls] original coords
    orig_shape: tuple[int, int]
    masks: Optional[Dict[str, np.ndarray]] = None  # sigmoid probs per scale
    latency_ms: float = 0.0


class InferenceEngine:
    """Fixed-batch jitted forward + device NMS over one compiled program."""

    def __init__(
        self,
        model,
        variables,
        imgsz: int = 640,
        batch: int = 8,
        conf: float = 0.25,
        iou: float = 0.45,
        max_det: int = 300,
        dtype=None,
        fuse: bool = True,
        with_masks: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        from mga_yolo_tpu.ops.nms import nms_jax
        from mga_yolo_tpu.utils.model_utils import fuse_variables

        if fuse:
            variables = fuse_variables(variables)
        if dtype is None:
            on_tpu = jax.devices()[0].platform not in ("cpu",)
            dtype = jnp.bfloat16 if on_tpu else jnp.float32
        self.imgsz, self.batch = imgsz, batch
        self.conf, self.iou, self.max_det = conf, iou, max_det
        self.with_masks = with_masks
        self._v = jax.tree_util.tree_map(
            lambda a: a.astype(dtype) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            variables,
        )

        def fwd(v, x):
            out = model.apply(v, x.astype(dtype) / 255.0, train=False)
            decoded, _ = out["det"]
            decoded = decoded.astype(jnp.float32)
            boxes, scores, cls = nms_jax(
                decoded, conf_thres=conf, iou_thres=iou, max_det=max_det
            )
            dets = jnp.concatenate([boxes, scores[..., None], cls[..., None]], axis=-1)
            if with_masks:
                seg = {k: jax.nn.sigmoid(s.astype(jnp.float32)) for k, s in out["seg"].items()}
                return dets, seg
            return dets, {}

        self._forward = jax.jit(fwd)

    def warmup(self) -> float:
        """Compile the program; returns compile wall seconds."""
        t0 = time.perf_counter()
        x = np.zeros((self.batch, self.imgsz, self.imgsz, 3), np.uint8)
        dets, _ = self._forward(self._v, x)
        np.asarray(dets)
        return time.perf_counter() - t0

    def preprocess(self, img: np.ndarray):
        from mga_yolo_tpu.data.transforms import letterbox

        lb = letterbox(
            {"img": img, "boxes": np.zeros((0, 4), np.float32),
             "cls": np.zeros((0,), np.float32)},
            self.imgsz, scaleup=False,
        )
        return lb["img"], (img.shape[:2], lb["ratio_pad"])

    def dispatch_batch(self, imgs: List[np.ndarray]):
        """Asynchronously dispatch one device batch; returns opaque handles.

        jax dispatch is async — this returns as soon as the program is
        enqueued, so the caller can pipeline further batches while results
        are in flight (essential when device->host fetch latency is high,
        e.g. a remote-TPU tunnel: throughput becomes pipelined-bandwidth
        bound instead of round-trip bound).
        """
        n = len(imgs)
        if n < self.batch:
            imgs = imgs + [imgs[-1]] * (self.batch - n)
        x = np.stack(imgs)
        t0 = time.perf_counter()
        dets, seg = self._forward(self._v, x)
        return (dets, seg, t0)

    def finalize_batch(self, handles, metas: List) -> List[Prediction]:
        """Materialize device results host-side and rescale per request."""
        from mga_yolo_tpu.train.predictor import scale_boxes

        dets, seg, t0 = handles
        dets = np.asarray(dets, np.float32)
        seg_np = {k: np.asarray(v, np.float32) for k, v in seg.items()}
        dt = (time.perf_counter() - t0) * 1e3
        out = []
        for i in range(len(metas)):
            orig_shape, ratio_pad = metas[i]
            d = dets[i]
            d = d[d[:, 4] > 0]  # drop padded slots (nms_jax zero-fills)
            boxes = d.copy()
            if len(boxes):
                boxes[:, :4] = scale_boxes(boxes[:, :4], ratio_pad, orig_shape)
            masks = (
                {k: seg_np[k][i, ..., 0] for k in seg_np} if self.with_masks else None
            )
            out.append(Prediction(boxes, orig_shape, masks, dt))
        return out

    def infer_batch(self, imgs: List[np.ndarray], metas: List) -> List[Prediction]:
        """imgs: letterboxed uint8 HWC arrays (<= batch). Returns per-image preds."""
        return self.finalize_batch(self.dispatch_batch(imgs), metas)


# --------------------------------------------------------------- micro-batcher


class _Request:
    __slots__ = ("img", "meta", "event", "result")

    def __init__(self, img, meta):
        self.img, self.meta = img, meta
        self.event = threading.Event()
        self.result: Optional[Prediction] = None


class MicroBatcher:
    """Coalesce concurrent requests into fixed-size device batches, with a
    pipelined dispatch/fetch split.

    One dispatcher thread owns device dispatch; a separate completion thread
    materializes results. Because jax dispatch is async, up to ``depth``
    batches are in flight at once — the device never idles waiting for a
    host fetch, and throughput is bound by compute/transfer bandwidth
    instead of the device->host round-trip latency (which dominates on a
    remote-TPU tunnel). A request waits at most ``max_wait_ms`` for its
    batch to fill; a full batch goes immediately.
    """

    def __init__(self, engine: InferenceEngine, max_wait_ms: float = 5.0, depth: int = 4):
        self.engine = engine
        self.max_wait = max_wait_ms / 1e3
        self._q: "queue.Queue[_Request]" = queue.Queue()
        # bounded: backpressure keeps at most `depth` batches in flight
        self._inflight: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._completer = threading.Thread(target=self._complete_loop, daemon=True)
        self._lock = threading.Lock()
        self.n_requests = 0
        self.n_batches = 0
        self._latencies: List[float] = []
        self._dispatcher.start()
        self._completer.start()

    def _dispatch_loop(self) -> None:
        B = self.engine.batch
        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < B:
                left = deadline - time.perf_counter()
                if left <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            try:
                handles = self.engine.dispatch_batch([r.img for r in batch])
            except Exception as e:  # propagate to all waiters
                for r in batch:
                    r.result = e
                    r.event.set()
                continue
            self._inflight.put((handles, batch))  # blocks at `depth` in flight

    def _complete_loop(self) -> None:
        while not self._stop.is_set() or not self._inflight.empty():
            try:
                handles, batch = self._inflight.get(timeout=0.1)
            except queue.Empty:
                continue
            t0 = handles[-1]
            try:
                preds = self.engine.finalize_batch(handles, [r.meta for r in batch])
            except Exception as e:
                for r in batch:
                    r.result = e
                    r.event.set()
                continue
            dt = (time.perf_counter() - t0) * 1e3
            with self._lock:
                self.n_batches += 1
                self._latencies.append(dt)
                if len(self._latencies) > 10_000:
                    del self._latencies[:5_000]
            for r, p in zip(batch, preds):
                r.result = p
                r.event.set()

    def submit(self, img: np.ndarray, timeout: float = 30.0) -> Prediction:
        lb, meta = self.engine.preprocess(img)
        req = _Request(lb, meta)
        with self._lock:
            self.n_requests += 1
        self._q.put(req)
        if not req.event.wait(timeout):
            raise TimeoutError("inference timed out")
        if isinstance(req.result, Exception):
            raise req.result
        return req.result

    def stats(self) -> dict:
        with self._lock:
            lat = np.asarray(self._latencies[-1000:], np.float64)
            n_req, n_b = self.n_requests, self.n_batches
        out = {"requests": n_req, "batches": n_b,
               "avg_batch_fill": round(n_req / n_b, 2) if n_b else None}
        if len(lat):
            out.update(
                batch_ms_p50=round(float(np.percentile(lat, 50)), 2),
                batch_ms_p99=round(float(np.percentile(lat, 99)), 2),
            )
        return out

    def close(self) -> None:
        self._stop.set()
        self._dispatcher.join(timeout=2)
        self._completer.join(timeout=5)


# ---------------------------------------------------------------- HTTP server


def _json_prediction(p: Prediction, want_masks: bool) -> dict:
    out = {
        "boxes": [
            {"x1": float(b[0]), "y1": float(b[1]), "x2": float(b[2]),
             "y2": float(b[3]), "conf": float(b[4]), "cls": int(b[5])}
            for b in p.boxes
        ],
        "orig_shape": list(p.orig_shape),
        "batch_ms": round(p.latency_ms, 2),
    }
    if want_masks and p.masks is not None:
        import cv2

        enc = {}
        for k, m in p.masks.items():
            ok, png = cv2.imencode(".png", (m * 255).astype(np.uint8))
            if ok:
                enc[k] = base64.b64encode(png.tobytes()).decode()
        out["mga_masks_png"] = enc
    return out


class MGAServer:
    """Threaded HTTP server over a MicroBatcher.

    Endpoints:
      POST /predict        image bytes (png/jpg) -> detections JSON
                           (?masks=1 adds base64-PNG sigmoid masks)
      GET  /healthz        200 once warm
      GET  /stats          micro-batcher statistics
    """

    def __init__(self, batcher: MicroBatcher, host: str = "127.0.0.1", port: int = 8008):
        self.batcher = batcher
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                if self.path.startswith("/healthz"):
                    self._send(200, {"status": "ok"})
                elif self.path.startswith("/stats"):
                    self._send(200, outer.batcher.stats())
                else:
                    self._send(404, {"error": "not found"})

            def do_POST(self):
                if not self.path.startswith("/predict"):
                    self._send(404, {"error": "not found"})
                    return
                import cv2

                n = int(self.headers.get("Content-Length", 0))
                if n > MAX_UPLOAD_BYTES:
                    self._send(413, {"error": f"payload too large (max {MAX_UPLOAD_BYTES} bytes)"})
                    return
                raw = self.rfile.read(n)
                img = cv2.imdecode(np.frombuffer(raw, np.uint8), cv2.IMREAD_COLOR)
                if img is None:
                    self._send(400, {"error": "could not decode image"})
                    return
                t0 = time.perf_counter()
                try:
                    pred = outer.batcher.submit(img)
                except TimeoutError:
                    self._send(503, {"error": "timeout"})
                    return
                except Exception as e:  # engine/device failure: JSON 500, not a
                    # dropped connection + per-request stderr traceback
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
                    return
                want_masks = "masks=1" in (self.path.partition("?")[2] or "")
                payload = _json_prediction(pred, want_masks)
                payload["latency_ms"] = round((time.perf_counter() - t0) * 1e3, 2)
                self._send(200, payload)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: Optional[threading.Thread] = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread:
            self._thread.join(timeout=2)
        self.batcher.close()


def build_server(
    weights: str | Path,
    imgsz: Optional[int] = None,
    batch: int = 8,
    conf: float = 0.25,
    iou: float = 0.45,
    max_det: int = 300,
    port: int = 8008,
    host: str = "127.0.0.1",
    with_masks: bool = False,
    max_wait_ms: float = 5.0,
    use_pallas: "bool | str | None" = "auto",
) -> MGAServer:
    from mga_yolo_tpu.utils.checkpoint import rebuild_from_checkpoint
    from mga_yolo_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    model, variables, meta = rebuild_from_checkpoint(weights, use_pallas=use_pallas)
    engine = InferenceEngine(
        model, variables,
        imgsz=imgsz or int(meta.get("imgsz", 640)),
        batch=batch, conf=conf, iou=iou, max_det=max_det, with_masks=with_masks,
    )
    compile_s = engine.warmup()
    print(f"[mga-serve] compiled {engine.batch}x{engine.imgsz}px program in {compile_s:.1f}s")
    return MGAServer(MicroBatcher(engine, max_wait_ms), host=host, port=port)
