"""Prediction source resolution: images, dirs, globs, videos, streams.

Re-implements the used subset of the reference's source plumbing
(`BasePredictor.setup_source` / `stream_inference`,
`/root/reference/mga_yolo/external/ultralytics/ultralytics/engine/predictor.py:250,277`
and `data/loaders.py` LoadImagesAndVideos/LoadStreams) as a flat frame
iterator: every source kind yields :class:`Frame` records, so the predictor
downstream is one code path — fixed-size batches into the single compiled
XLA forward. Webcam/RTSP sources are the same ``cv2.VideoCapture`` loop with
an unbounded frame count.
"""

from __future__ import annotations

import dataclasses
import glob as _glob
from pathlib import Path
from typing import Iterable, Iterator, List, Optional, Union

import cv2
import numpy as np

from mga_yolo_tpu.data.dataset import IMG_EXTS

VID_EXTS = {".mp4", ".avi", ".mov", ".mkv", ".m4v", ".mpg", ".mpeg", ".webm", ".wmv", ".gif"}
STREAM_PREFIXES = ("rtsp://", "rtmp://", "http://", "https://", "tcp://")


@dataclasses.dataclass
class Frame:
    """One decoded BGR frame plus provenance for writers/artifacts."""

    img: np.ndarray
    path: str                 # source file/URL ("webcam:0" for camera indices)
    index: int = 0            # frame index within its source (0 for stills)
    is_video: bool = False
    fps: float = 0.0          # source fps (0 when unknown / still image)
    total: int = 0            # total frames if known, else 0

    @property
    def stem(self) -> str:
        return Path(self.path).stem if "://" not in self.path else "stream"


SourceLike = Union[str, Path, int, np.ndarray]


def _iter_video(path: str, cam_index: Optional[int] = None, max_frames: int = 0) -> Iterator[Frame]:
    cap = cv2.VideoCapture(cam_index if cam_index is not None else path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video source: {path}")
    fps = float(cap.get(cv2.CAP_PROP_FPS) or 0.0)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
    i = 0
    try:
        while True:
            ok, img = cap.read()
            if not ok or img is None:
                break
            yield Frame(img=img, path=path, index=i, is_video=True, fps=fps, total=total)
            i += 1
            if max_frames and i >= max_frames:
                break
    finally:
        cap.release()


def list_files(source: Union[str, Path]) -> List[Path]:
    """Expand a dir / glob / single file into a sorted file list."""
    s = str(source)
    p = Path(s)
    if p.is_dir():
        return sorted(q for q in p.rglob("*") if q.suffix.lower() in IMG_EXTS | VID_EXTS)
    if any(ch in s for ch in "*?["):
        return sorted(Path(q) for q in _glob.glob(s, recursive=True))
    return [p]


def iter_source(
    source: Union[SourceLike, Iterable[SourceLike]],
    max_frames: int = 0,
) -> Iterator[Frame]:
    """Yield Frames from any supported source kind.

    str/Path: image file, video file, directory (recursive, images+videos),
    glob pattern, stream URL, or a digit string (webcam index). int: webcam.
    ndarray: a decoded frame. Iterables of the above are flattened.
    ``max_frames`` caps frames taken per video/stream source (0 = all).
    """
    if isinstance(source, np.ndarray):
        yield Frame(img=source, path="<array>")
        return
    if isinstance(source, int):
        yield from _iter_video(f"webcam:{source}", cam_index=source, max_frames=max_frames)
        return
    if isinstance(source, (str, Path)):
        s = str(source)
        if s.lower().startswith(STREAM_PREFIXES):
            yield from _iter_video(s, max_frames=max_frames)
            return
        if s.isdigit():
            yield from _iter_video(f"webcam:{s}", cam_index=int(s), max_frames=max_frames)
            return
        for f in list_files(s):
            if f.suffix.lower() in VID_EXTS:
                yield from _iter_video(str(f), max_frames=max_frames)
            else:
                img = cv2.imread(str(f))
                if img is None:
                    raise FileNotFoundError(f"cannot read image: {f}")
                yield Frame(img=img, path=str(f))
        return
    # iterable of mixed sources
    for item in source:
        yield from iter_source(item, max_frames=max_frames)


class VideoSink:
    """Lazily-opened annotated-video writer, one per source video.

    Uses MJPG for .avi and mp4v for .mp4 — the two codecs OpenCV builds
    carry everywhere. Frame size is fixed by the first frame (the decoder
    yields constant-size frames per source).
    """

    def __init__(self, out_path: Path, fps: float):
        self.out_path = Path(out_path)
        self.fps = fps if fps and fps > 0 else 30.0
        self._writer: Optional[cv2.VideoWriter] = None
        self.frames_written = 0

    def write(self, img: np.ndarray) -> None:
        if self._writer is None:
            fourcc = "MJPG" if self.out_path.suffix.lower() == ".avi" else "mp4v"
            self._writer = cv2.VideoWriter(
                str(self.out_path), cv2.VideoWriter_fourcc(*fourcc),
                self.fps, (img.shape[1], img.shape[0]),
            )
            if not self._writer.isOpened():
                raise RuntimeError(f"cannot open video writer: {self.out_path}")
        self._writer.write(img)
        self.frames_written += 1

    def close(self) -> None:
        if self._writer is not None:
            self._writer.release()
            self._writer = None
