"""Streaming predict sources: images/dirs/globs/videos through one iterator.

Covers the replacement for the reference's `BasePredictor.setup_source` /
`stream_inference` (`engine/predictor.py:250,277`): frame iteration for every
source kind, order preservation through fixed-batch streaming, and the
annotated-video writer round-trip.
"""

from pathlib import Path

import cv2
import numpy as np
import pytest

from mga_yolo_tpu.data.sources import Frame, VideoSink, iter_source, list_files


@pytest.fixture(scope="module")
def media_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(d / f"img{i}.jpg"), rng.integers(0, 255, (48, 64, 3), np.uint8))
    # 8-frame MJPG avi — the codec OpenCV builds always carry
    vw = cv2.VideoWriter(str(d / "clip.avi"), cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (64, 48))
    assert vw.isOpened()
    for i in range(8):
        frame = np.full((48, 64, 3), i * 30, np.uint8)
        vw.write(frame)
    vw.release()
    return d


def test_iter_single_image(media_dir):
    frames = list(iter_source(str(media_dir / "img0.jpg")))
    assert len(frames) == 1
    f = frames[0]
    assert not f.is_video and f.index == 0 and f.img.shape == (48, 64, 3)


def test_iter_video_frames_ordered(media_dir):
    frames = list(iter_source(str(media_dir / "clip.avi")))
    assert len(frames) == 8
    assert all(f.is_video for f in frames)
    assert [f.index for f in frames] == list(range(8))
    assert frames[0].fps == pytest.approx(10.0)
    assert frames[0].total == 8
    # MJPG is lossy but frame ordering must survive: brightness is monotone
    means = [float(f.img.mean()) for f in frames]
    assert means == sorted(means)


def test_iter_directory_mixes_images_and_videos(media_dir):
    frames = list(iter_source(str(media_dir)))
    # 8 video frames + 3 stills
    assert sum(f.is_video for f in frames) == 8
    assert sum(not f.is_video for f in frames) == 3


def test_iter_glob_and_max_frames(media_dir):
    frames = list(iter_source(str(media_dir / "img*.jpg")))
    assert len(frames) == 3 and {Path(f.path).name for f in frames} == {
        "img0.jpg", "img1.jpg", "img2.jpg"
    }
    capped = list(iter_source(str(media_dir / "clip.avi"), max_frames=3))
    assert len(capped) == 3


def test_iter_ndarray():
    arr = np.zeros((32, 32, 3), np.uint8)
    (f,) = list(iter_source(arr))
    assert f.path == "<array>" and f.img is arr


def test_missing_source_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        list(iter_source(str(tmp_path / "nope.mp4")))


def test_list_files_sorted(media_dir):
    names = [p.name for p in list_files(media_dir)]
    assert names == sorted(names) and "clip.avi" in names


def test_video_sink_roundtrip(tmp_path):
    sink = VideoSink(tmp_path / "out.avi", fps=10.0)
    for i in range(5):
        sink.write(np.full((48, 64, 3), i * 40, np.uint8))
    sink.close()
    cap = cv2.VideoCapture(str(tmp_path / "out.avi"))
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 5
    cap.release()


def test_predictor_stream_video(media_dir):
    """stream() pushes video frames through the real jitted forward in order,
    with partial batches padded to the single compiled shape."""
    import jax

    from mga_yolo_tpu.models.yolo import create_model
    from mga_yolo_tpu.train.predictor import MGAPredictor
    from mga_yolo_tpu.train.state import create_train_state

    model, spec = create_model("configs/models/yolov8_cbam.yaml", scale="n", nc=1,
                               use_pallas=False, training=False)
    st = create_train_state(model, jax.random.PRNGKey(0), imgsz=64)
    variables = {"params": {k: v for k, v in st.params.items() if k != "mtl_log_vars"}}
    if st.batch_stats:
        variables["batch_stats"] = st.batch_stats

    pred = MGAPredictor(model, variables, imgsz=64, conf=0.0)
    out = list(pred.stream(str(media_dir / "clip.avi"), batch_size=4))
    assert len(out) == 8
    for i, (frame, r) in enumerate(out):
        assert isinstance(frame, Frame) and frame.index == i
        assert r.orig_shape == (48, 64)
        assert set(r.mga_masks) == {"p3", "p4", "p5"}
    # 8 frames / batch 4 -> exactly 2 compiled batches of one shape
    # (same compiled fn also serves a mixed dir source incl. the tail pad)
    mixed = list(pred.stream(str(media_dir), batch_size=4))
    assert len(mixed) == 11
