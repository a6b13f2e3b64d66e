"""Serving surface: micro-batched engine + HTTP server round-trip (CPU).

Covers `mga_yolo_tpu/serve.py`: fixed-shape padded inference, request
coalescing, and the JSON contract of POST /predict, GET /healthz, GET /stats.
"""

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

IMGSZ = 64


@pytest.fixture(scope="module")
def engine():
    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.serve import InferenceEngine

    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.PRNGKey(0), np.zeros((1, IMGSZ, IMGSZ, 3), np.float32)
    )
    eng = InferenceEngine(
        model, dict(variables), imgsz=IMGSZ, batch=2, conf=0.01, max_det=16,
        fuse=True, with_masks=True,
    )
    eng.warmup()
    return eng


def test_engine_padded_batch(engine):
    img = np.random.default_rng(0).integers(0, 255, (48, 80, 3)).astype(np.uint8)
    lb, meta = engine.preprocess(img)
    assert lb.shape == (IMGSZ, IMGSZ, 3)
    preds = engine.infer_batch([lb], [meta])  # 1 < batch: exercises padding
    assert len(preds) == 1
    p = preds[0]
    assert p.boxes.shape[1] == 6
    assert p.orig_shape == (48, 80)
    # boxes live in original coords
    if len(p.boxes):
        assert p.boxes[:, [0, 2]].max() <= 80 + 1e-3
        assert p.boxes[:, [1, 3]].max() <= 48 + 1e-3
    assert set(p.masks) == {"p3", "p4", "p5"}


def test_microbatcher_coalesces(engine):
    from mga_yolo_tpu.serve import MicroBatcher

    mb = MicroBatcher(engine, max_wait_ms=200.0)
    try:
        img = np.zeros((IMGSZ, IMGSZ, 3), np.uint8)
        results = [None, None]

        def call(i):
            results[i] = mb.submit(img)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert all(r is not None for r in results)
        s = mb.stats()
        assert s["requests"] == 2
        # two concurrent requests within the wait window -> ONE device batch
        assert s["batches"] == 1
    finally:
        mb.close()


def test_http_roundtrip(engine):
    import cv2

    from mga_yolo_tpu.serve import MGAServer, MicroBatcher

    server = MGAServer(MicroBatcher(engine, max_wait_ms=1.0), port=0)
    server.start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=10) as r:
            assert json.loads(r.read())["status"] == "ok"

        img = np.random.default_rng(1).integers(0, 255, (72, 56, 3)).astype(np.uint8)
        ok, payload = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"{base}/predict?masks=1", data=payload.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["orig_shape"] == [72, 56]
        assert isinstance(out["boxes"], list)
        assert set(out["mga_masks_png"]) == {"p3", "p4", "p5"}
        assert out["latency_ms"] > 0

        with urllib.request.urlopen(f"{base}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1
    finally:
        server.stop()


def test_microbatcher_pipelined_stress(engine):
    """40 concurrent requests through the depth-4 pipelined batcher: all
    complete, none deadlock, multiple batches were in flight."""
    from mga_yolo_tpu.serve import MicroBatcher

    b = MicroBatcher(engine, max_wait_ms=2.0, depth=4)
    imgs = [
        np.random.default_rng(i).integers(0, 255, (50, 70, 3)).astype(np.uint8)
        for i in range(8)
    ]
    results, errors = [], []
    lock = threading.Lock()

    def worker(i):
        try:
            p = b.submit(imgs[i % len(imgs)], timeout=60)
            with lock:
                results.append(p)
        except Exception as e:  # noqa: BLE001
            with lock:
                errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(40)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    try:
        assert not errors, errors[:3]
        assert len(results) == 40
        stats = b.stats()
        assert stats["requests"] == 40
        assert stats["batches"] >= 40 // engine.batch  # coalesced into batches
        for p in results:
            assert p.boxes.shape[1] == 6
    finally:
        b.close()
