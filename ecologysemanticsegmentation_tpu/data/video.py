"""Video pipeline: frame extraction, batched dataset, video reassembly.

Rebuild of the reference's ``test_video.py:16-67`` (``parse_video`` +
``VideoDataset``), plus the README's promised-but-unimplemented step 3 —
frames -> video reassembly (reference ``README.md:69-77``).

The reference latent bug (``test_video.py:59`` unpacks two values from the
one-value ``parse_video`` return) is *not* reproduced; here the API is
explicit.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from . import imops


def parse_video(
    video_path: str, frames_dir: str = "frames", write_frames: bool = True
) -> tuple[np.ndarray, float]:
    """Extract all frames; optionally write ``frames/frame_i.jpg``.

    Returns (frames array [N,H,W,3] RGB uint8, fps).
    """
    # capture has no PIL equivalent: imops.cv2_or_stub raises an explicit
    # error at this call when OpenCV is absent
    cap = imops.cv2_or_stub.VideoCapture(video_path)
    if not cap.isOpened():
        raise FileNotFoundError(f"cannot open video: {video_path}")
    fps = cap.get(imops.cv2_or_stub.CAP_PROP_FPS) or 25.0
    if write_frames:
        os.makedirs(frames_dir, exist_ok=True)
    frames = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if write_frames:
            imops.imwrite_bgr(os.path.join(frames_dir, f"frame_{i}.jpg"), frame)
        frames.append(np.ascontiguousarray(frame[..., ::-1]))  # BGR -> RGB
        i += 1
    cap.release()
    if not frames:
        raise ValueError(f"no frames decoded from {video_path}")
    return np.stack(frames), fps


class VideoDataset:
    """Frame dataset resized/normalized for the jitted forward pass."""

    def __init__(self, video_path: str, img_shape: int = 256, frames_dir: str = "frames"):
        self.frames, self.fps = parse_video(video_path, frames_dir)
        self.img_shape = img_shape

    def __len__(self) -> int:
        return len(self.frames)

    def __getitem__(self, i: int):
        frame = imops.resize_linear(self.frames[i], (self.img_shape, self.img_shape))
        img = frame.astype(np.float32) / 255.0
        # masks unused in inference; keep the (image, label, path) contract
        return img, np.zeros((self.img_shape, self.img_shape, 1), np.float32), f"frame_{i}"


def reassemble_video(
    frames_dir: str,
    out_path: str,
    fps: float = 25.0,
    pattern: str = "output_frame_%d.jpg",
) -> str:
    """Frames -> video (the README's step 3, completed)."""
    paths = []
    i = 0
    while True:
        p = os.path.join(frames_dir, pattern % i)
        if not os.path.exists(p):
            break
        paths.append(p)
        i += 1
    if not paths:
        # fall back to glob ordering
        paths = sorted(glob.glob(os.path.join(frames_dir, "*.jpg")))
    if not paths:
        raise ValueError(f"no frames found in {frames_dir}")
    cv2 = imops.cv2_or_stub  # encode has no PIL equivalent
    first = imops.imread_bgr(paths[0])
    h, w = first.shape[:2]
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for p in paths:
        writer.write(imops.imread_bgr(p))
    writer.release()
    return out_path
