"""Video/media IO helpers (host side).

Equivalents of the reference's media utils (``models/video_models/utils.py``):
``extract_opencv`` video decode (``utils.py:8-20``), txt/json/npz helpers
(``utils.py:24-41``). Decode stays on the host — raw frame tensors feed the
batched on-device transform pipeline (``deeplip_tpu.ops.video``). OpenCV is
optional; callers gate on :func:`cv2_available`.
"""

from __future__ import annotations

import json
import os

import numpy as np


def cv2_available() -> bool:
    try:
        import cv2  # noqa: F401

        return True
    except Exception:  # pragma: no cover
        return False


def extract_video_frames(path: str, to_gray: bool = True) -> np.ndarray:
    """Decode a video file to ``(T, H, W[, 3])`` uint8 frames (cv2)."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    try:
        while cap.isOpened():
            ok, frame = cap.read()
            if not ok:
                break
            if to_gray:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            else:
                frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
            frames.append(frame)
    finally:
        cap.release()
    return np.stack(frames) if frames else np.zeros((0, 0, 0), np.uint8)


def read_txt_lines(path: str) -> list[str]:
    if not os.path.isfile(path):
        raise FileNotFoundError(f"{path} not found")
    with open(path) as f:
        return [line.rstrip() for line in f]


def load_json(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def save2npz(path: str, data: np.ndarray) -> None:
    """npz with key 'data' (the clip/embedding container format)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, data=data)
