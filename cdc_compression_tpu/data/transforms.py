"""Sequence/image transform zoo (numpy, NHWC/THWC-native).

Behavioral spec: `epsilonparam/data/misc_data_util/transforms.py` — the
reference's PIL/torch transform collection, re-done for this framework's
conventions:

* images are HWC numpy arrays (uint8 or float32), sequences are either a
  list of HWC frames or a stacked THWC array — never torch tensors;
* every transform takes `(x, rng)` with a `np.random.RandomState`, so a
  stack is reproducible from a single seed (the reference draws from
  torch's global generator);
* random spatial/temporal parameters are drawn ONCE per call and shared
  across all frames of a sequence (matching the reference's list
  handling, e.g. `transforms.py:34-77`);
* there is no ToTensor/ImageToTensor/ChannelFirst trio — NHWC float is
  already the device layout on TPU. `ImageToTensor` survives as the
  uint8→[0,1] float cast and `ChannelLast` converts torch-sourced TCHW
  arrays into THWC.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

Array = np.ndarray
SeqOrImg = Union[Array, List[Array]]


def _is_seq(x: SeqOrImg) -> bool:
    return isinstance(x, (list, tuple)) or (isinstance(x, np.ndarray) and x.ndim == 4)


def _frames(x: SeqOrImg) -> List[Array]:
    if isinstance(x, (list, tuple)):
        return list(x)
    if x.ndim == 4:
        return list(x)
    return [x]


def _rebuild(x: SeqOrImg, frames: List[Array]) -> SeqOrImg:
    if isinstance(x, (list, tuple)):
        return frames
    if isinstance(x, np.ndarray) and x.ndim == 4:
        return np.stack(frames)
    return frames[0]


def _resize_frame(img: Array, hw) -> Array:
    from PIL import Image

    nh, nw = hw
    dtype = img.dtype
    arr = img
    if dtype != np.uint8:
        arr = np.clip(arr, 0, 255).astype(np.uint8) if arr.max() > 1.5 else (
            np.clip(arr, 0.0, 1.0) * 255
        ).astype(np.uint8)
    out = np.asarray(Image.fromarray(arr).resize((nw, nh), Image.BILINEAR))
    if dtype != np.uint8:
        out = out.astype(np.float32) / 255.0 if img.max() <= 1.5 else out.astype(dtype)
    return out


class Compose:
    """Chain transforms, threading one RandomState through the stack."""

    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, x, rng=None):
        rng = rng or np.random.RandomState()
        for t in self.transforms:
            x = t(x, rng)
        return x


class RandomRotation:
    """Same random angle applied to every frame (transforms.py:19-31)."""

    def __init__(self, max_angle: int = 15):
        self.max_angle = max_angle

    def __call__(self, x: SeqOrImg, rng: np.random.RandomState) -> SeqOrImg:
        from PIL import Image

        angle = int(rng.randint(-self.max_angle, self.max_angle))
        frames = [
            np.asarray(Image.fromarray(np.ascontiguousarray(f)).rotate(angle))
            for f in _frames(x)
        ]
        return _rebuild(x, frames)


def trim_uniform_border(img: Array) -> Array:
    """Crop away a border that matches the top-left pixel (the reference's
    `black_trim` bbox trick, transforms.py:11-16)."""
    ref = img[0, 0]
    diff = np.abs(img.astype(np.int32) - ref.astype(np.int32)).sum(axis=-1)
    ys, xs = np.nonzero(diff > 30)  # reference: add(diff, diff, 2.0, -100)
    if ys.size == 0:
        return img
    return img[ys.min() : ys.max() + 1, xs.min() : xs.max() + 1]


class SeqRandomCrop:
    """One random spatial crop shared by all frames (transforms.py:34-77);
    `black_trim` first trims the uniform border of frame 0."""

    def __init__(self, size, black_trim: bool = False):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.black_trim = black_trim

    def __call__(self, x: SeqOrImg, rng: np.random.RandomState) -> SeqOrImg:
        frames = _frames(x)
        sw, sh = self.size  # reference order: (width, height)
        if self.black_trim:
            trimmed = trim_uniform_border(frames[0])
            if trimmed.shape[0] >= sh and trimmed.shape[1] >= sw:
                frames = [trim_uniform_border(f) for f in frames]
        h, w = frames[0].shape[:2]
        left = int(rng.randint(0, max(1, w - sw + 1)))
        top = int(rng.randint(0, max(1, h - sh + 1)))
        frames = [f[top : top + sh, left : left + sw] for f in frames]
        return _rebuild(x, frames)


class VFResize:
    """torchvision-`resize` semantics: int → shorter side, tuple → exact
    (transforms.py:113-125)."""

    def __init__(self, img_size):
        self.img_size = img_size

    def _target(self, h: int, w: int):
        s = self.img_size
        if isinstance(s, int):
            if h < w:
                return s, int(round(w * s / h))
            return int(round(h * s / w)), s
        return tuple(s)

    def __call__(self, x: SeqOrImg, rng=None) -> SeqOrImg:
        frames = _frames(x)
        hw = self._target(*frames[0].shape[:2])
        return _rebuild(x, [_resize_frame(f, hw) for f in frames])


class RandomSequenceCrop:
    """Random temporal window of `seq_len` frames (transforms.py:127-146)."""

    def __init__(self, seq_len: int):
        self.seq_len = seq_len

    def __call__(self, x: SeqOrImg, rng: np.random.RandomState) -> SeqOrImg:
        n = len(x) if isinstance(x, (list, tuple)) else x.shape[0]
        max_start = n - self.seq_len + 1
        if max_start <= 0:
            raise ValueError(f"sequence of {n} frames shorter than seq_len={self.seq_len}")
        start = int(rng.randint(0, max_start))
        return x[start : start + self.seq_len]


class FixedSequenceCrop:
    """Deterministic temporal window (transforms.py:149-159)."""

    def __init__(self, seq_len: int, start_index: int = 0):
        self.seq_len = seq_len
        self.start_index = start_index

    def __call__(self, x: SeqOrImg, rng=None) -> SeqOrImg:
        return x[self.start_index : self.start_index + self.seq_len]


class ConcatSequence:
    """list of HWC frames -> THWC array (transforms.py:162-171)."""

    def __call__(self, x: SeqOrImg, rng=None) -> Array:
        return np.stack(list(x)) if isinstance(x, (list, tuple)) else x


class ImageToTensor:
    """uint8 HWC/THWC -> float32 in [0,1] (transforms.py:174-185; layout
    stays channels-last — that IS the tensor layout here)."""

    def __call__(self, x: SeqOrImg, rng=None) -> SeqOrImg:
        frames = [np.asarray(f, np.float32) / 255.0 for f in _frames(x)]
        return _rebuild(x, frames)


class Normalize:
    """(x - mean) / std elementwise (transforms.py:218-237)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, x: SeqOrImg, rng=None) -> SeqOrImg:
        frames = [(np.asarray(f, np.float32) - self.mean) / self.std for f in _frames(x)]
        return _rebuild(x, frames)


class NormalizeImage(Normalize):
    """Per-channel mean/std over the trailing channel axis
    (transforms.py:200-215; NHWC broadcasting does it natively)."""


class ChannelLast:
    """torch-sourced (T)CHW -> (T)HWC (inverse of transforms.py:240-245
    ChannelFirst — this framework's device layout is channels-last)."""

    def __call__(self, x: Array, rng=None) -> Array:
        if x.ndim == 4:
            return np.transpose(x, (0, 2, 3, 1))
        return np.transpose(x, (1, 2, 0))


class ResizeFrameSeq:
    """Bilinear resize of every frame to exactly (h, w)
    (transforms.py:248-254)."""

    def __init__(self, h: int, w: int):
        self.h, self.w = h, w

    def __call__(self, x: SeqOrImg, rng=None) -> SeqOrImg:
        return _rebuild(x, [_resize_frame(f, (self.h, self.w)) for f in _frames(x)])


class ResizeSeqMin:
    """Resize so the shorter spatial side equals `min_len`, preserving
    aspect (transforms.py:257-271)."""

    def __init__(self, min_len: int):
        self.min_len = min_len

    def __call__(self, x: SeqOrImg, rng=None) -> SeqOrImg:
        frames = _frames(x)
        h, w = frames[0].shape[:2]
        if h < w:
            hw = (self.min_len, int(round(w / h * self.min_len)))
        else:
            hw = (int(round(h / w * self.min_len)), self.min_len)
        return _rebuild(x, [_resize_frame(f, hw) for f in frames])


class SegmentCrop:
    """Random spatial crop of a THWC sequence, same window for all frames
    (transforms.py:274-288)."""

    def __init__(self, h: int, w: int):
        self.h, self.w = h, w

    def __call__(self, x: Array, rng: np.random.RandomState) -> Array:
        H, W = x.shape[1:3]
        if self.h > H or self.w > W:
            raise ValueError(f"crop {self.h}x{self.w} larger than frames {H}x{W}")
        top = int(rng.randint(0, H - self.h + 1))
        left = int(rng.randint(0, W - self.w + 1))
        return x[:, top : top + self.h, left : left + self.w]


class FixedSegmentCrop:
    """Top-left spatial crop of a THWC sequence (transforms.py:291-303)."""

    def __init__(self, h: int, w: int):
        self.h, self.w = h, w

    def __call__(self, x: Array, rng=None) -> Array:
        return x[:, : self.h, : self.w]


class BinSequence:
    """1-D series -> (n_bins, window), dropping the remainder
    (transforms.py:306-326)."""

    def __init__(self, window: int):
        self.window = window

    def __call__(self, x, rng=None) -> Array:
        arr = np.asarray(x)
        n_bins = arr.shape[0] // self.window
        return arr[: n_bins * self.window].reshape(-1, self.window)


class CentercropList:
    """Center crop every frame (transforms.py:329-334)."""

    def __init__(self, img_size):
        self.size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)

    def __call__(self, x: SeqOrImg, rng=None) -> SeqOrImg:
        sh, sw = self.size
        frames = []
        for f in _frames(x):
            h, w = f.shape[:2]
            top, left = max(0, (h - sh) // 2), max(0, (w - sw) // 2)
            frames.append(f[top : top + sh, left : left + sw])
        return _rebuild(x, frames)
