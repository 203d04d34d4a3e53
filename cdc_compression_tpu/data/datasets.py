"""Image datasets for codec training/eval.

Behavioral spec: `epsilonparam/data/load_dataset.py` and
`epsilonparam/data/datasets/{image,vimeo}.py` — the image-codec-relevant
subset of the reference zoo (IMG flat-dir, VIMEO septuplets, and the
deterministic eval sets Kodak/Tecnick/DIV2K/COCO-style folders), plus the
per-dataset transform stacks (`load_dataset.py:257-319`).

Differences by design:
* file lists are **sorted** — the reference's `os.listdir` order is
  nondeterministic (SURVEY appendix), which breaks golden eval batches;
* datasets return NHWC float32 in [0,1]; the trainer maps to [-1,1]
  (matching `trainer.py:130`);
* grayscale images are expanded to 3 channels (reference `image.py:6-24`).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _load_image(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        return np.asarray(im, np.uint8)


# ---------------------------------------------------------------------------
# transforms (numpy, HWC uint8 in / float32 out at the end of the stack)
# ---------------------------------------------------------------------------


class RandomCrop:
    """Random spatial crop (reference transforms.py:34)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        h, w = img.shape[:2]
        s = self.size
        if h < s or w < s:  # upscale-pad small images
            pad_h, pad_w = max(0, s - h), max(0, s - w)
            img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
            h, w = img.shape[:2]
        top = rng.randint(0, h - s + 1)
        left = rng.randint(0, w - s + 1)
        return img[top : top + s, left : left + s]


class CenterCrop:
    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: np.ndarray, rng=None) -> np.ndarray:
        h, w = img.shape[:2]
        s = self.size
        top, left = max(0, (h - s) // 2), max(0, (w - s) // 2)
        return img[top : top + s, left : left + s]


class Resize:
    """Shorter-side resize keeping aspect (reference transforms.py:97)."""

    def __init__(self, size: int):
        self.size = size

    def __call__(self, img: np.ndarray, rng=None) -> np.ndarray:
        from PIL import Image

        h, w = img.shape[:2]
        if min(h, w) == self.size:
            return img
        if h < w:
            nh, nw = self.size, int(round(w * self.size / h))
        else:
            nh, nw = int(round(h * self.size / w)), self.size
        return np.asarray(Image.fromarray(img).resize((nw, nh), Image.BILINEAR))


class RandomHorizontalFlip:
    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, img: np.ndarray, rng: np.random.RandomState) -> np.ndarray:
        return img[:, ::-1] if rng.rand() < self.p else img


class PadToMultiple:
    """Reflect-pad H/W up to a multiple (for jit-friendly eval shapes)."""

    def __init__(self, multiple: int = 64):
        self.multiple = multiple

    def __call__(self, img: np.ndarray, rng=None) -> np.ndarray:
        h, w = img.shape[:2]
        m = self.multiple
        ph, pw = (-h) % m, (-w) % m
        if ph or pw:
            img = np.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        return img


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


class ImageFolderDataset:
    """Flat directory of images (reference `datasets/image.py` IMG)."""

    def __init__(
        self,
        root: str,
        transforms: Sequence[Callable] = (),
        exts: Tuple[str, ...] = _IMG_EXTS,
        recursive: bool = False,
    ):
        root_p = Path(root)
        if recursive:
            files = [p for p in root_p.rglob("*") if p.suffix.lower() in exts]
        else:
            files = [p for p in root_p.iterdir() if p.suffix.lower() in exts]
        self.files: List[str] = sorted(str(p) for p in files)
        if not self.files:
            raise FileNotFoundError(f"no images under {root}")
        self.transforms = list(transforms)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        rng = rng or np.random.RandomState()
        img = _load_image(self.files[idx])
        for t in self.transforms:
            img = t(img, rng)
        return np.asarray(img, np.float32) / 255.0


class VimeoDataset(ImageFolderDataset):
    """Vimeo-90k septuplets via the official list files
    (reference `datasets/vimeo.py:8-39`, single-frame mode)."""

    def __init__(self, root: str, train: bool = True, transforms: Sequence[Callable] = (),
                 frame: str = "im4.png"):
        list_file = Path(root) / ("sep_trainlist.txt" if train else "sep_testlist.txt")
        seq_dir = Path(root) / "sequences"
        with open(list_file) as f:
            entries = [ln.strip() for ln in f if ln.strip()]
        self.files = sorted(str(seq_dir / e / frame) for e in entries)
        if not self.files:
            raise FileNotFoundError(f"no vimeo entries under {root}")
        self.transforms = list(transforms)


_EVAL_TRANSFORMS = {
    # reference `load_dataset.py` per-dataset stacks
    "kodak": [],                      # full-res 768x512 (:270-278)
    "tecnick": [CenterCrop(1200)],    # (:279-287)
    "div2k": [Resize(768), CenterCrop(768)],  # (:288-298)
    "coco": [Resize(256), CenterCrop(256)],   # (:299-319)
}


# Video/physics datasets the reference carries as unused leftovers from a
# video-codec era (kth_actions, bair, moving_mnist, bouncing_ball, big,
# youtube, uvg, audi, city, climate, simu — `data/datasets/*`, SURVEY
# §2.8). They are not on any code path of the image codec; requesting one
# raises with this context instead of silently training on nothing.
_VIDEO_LEFTOVERS = frozenset({
    "kth_actions", "bair", "moving_mnist", "stochastic_moving_mnist",
    "bouncing_ball", "big", "youtube", "uvg", "audi", "city", "climate", "simu",
})


def load_dataset(name: str, path: str, train: bool = True, img_size: int = 256,
                 hflip: bool = False):
    """Name-switch dataset factory (reference `load_dataset.py:11` shape).

    Train stacks: random crop to `img_size` (+ optional hflip); eval
    stacks follow the reference's deterministic per-dataset pipelines.
    """
    name = name.lower()
    if name in _VIDEO_LEFTOVERS:
        raise NotImplementedError(
            f"dataset '{name}' is a video/physics leftover in the reference "
            "with no role in the image codec; use an image dataset "
            "(vimeo/kodak/tecnick/div2k/coco or any image folder)"
        )
    if train:
        tfs: List[Callable] = [RandomCrop(img_size)]
        if hflip:
            tfs.append(RandomHorizontalFlip())
        if name == "vimeo":
            return VimeoDataset(path, train=True, transforms=tfs)
        return ImageFolderDataset(path, transforms=tfs, recursive=True)
    if name == "vimeo":
        return VimeoDataset(path, train=False, transforms=[CenterCrop(256)])
    tfs = list(_EVAL_TRANSFORMS.get(name, [PadToMultiple(64)]))
    return ImageFolderDataset(path, transforms=tfs, recursive=(name not in ("kodak",)))
