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
        # bounded decoded-image cache: random-crop training re-reads the
        # same file once per crop, and PNG decode dominates the host side
        # of the train loop on small datasets (measured: the 3-image Kodak
        # run is loader-bound without it). Transforms never mutate the
        # source array (crops are views, flips are copies).
        self._cache: dict = {}
        self._cache_cap = 64

    def __len__(self):
        return len(self.files)

    def _load_cached(self, path: str) -> np.ndarray:
        img = self._cache.get(path)
        if img is None:
            img = _load_image(path)
            if len(self._cache) >= self._cache_cap:
                self._cache.pop(next(iter(self._cache)))
            self._cache[path] = img
        return img

    def __getitem__(self, idx: int, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        rng = rng or np.random.RandomState()
        img = self._load_cached(self.files[idx])
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


# ---------------------------------------------------------------------------
# sequence (video / physics) datasets — reference `data/datasets/*` zoo
# ---------------------------------------------------------------------------


class FrameSequenceDataset:
    """Directory-of-videos dataset: each subdir holds one clip's frames.

    Covers the reference's frame-folder video family (`datasets/kth_actions.py`,
    `bair.py`, `big.py`, `youtube.py`, `uvg.py`, `audi.py`, `city.py` — all
    read per-clip frame folders after their converters run). Returns
    [S,H,W,3] float32 in [0,1]; spatial transforms are applied with a
    per-item cloned RNG so every frame of a clip gets the same crop/flip.
    """

    def __init__(self, root: str, seq_len: int = 7, train: bool = True,
                 transforms: Sequence[Callable] = (), exts: Tuple[str, ...] = _IMG_EXTS):
        root_p = Path(root)
        clips = []
        for d in sorted(p for p in root_p.iterdir() if p.is_dir()):
            frames = sorted(str(p) for p in d.iterdir() if p.suffix.lower() in exts)
            if len(frames) >= seq_len:
                clips.append(frames)
        if not clips:
            raise FileNotFoundError(f"no clips with >= {seq_len} frames under {root}")
        self.clips = clips
        self.seq_len = seq_len
        self.train = train
        self.transforms = list(transforms)

    def __len__(self):
        return len(self.clips)

    def __getitem__(self, idx: int, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        rng = rng or np.random.RandomState()
        frames = self.clips[idx]
        # temporal crop: random when training (reference RandomSequenceCrop,
        # transforms.py:127), fixed head when eval (FixedSequenceCrop :149)
        start = rng.randint(0, len(frames) - self.seq_len + 1) if self.train else 0
        seed = rng.randint(0, 2**31 - 1)
        out = []
        for f in frames[start : start + self.seq_len]:
            img = _load_image(f)
            frng = np.random.RandomState(seed)  # same draws per frame
            for t in self.transforms:
                img = t(img, frng)
            out.append(np.asarray(img, np.float32) / 255.0)
        return np.stack(out, 0)


class NpySequenceDataset:
    """.npy physics-field sequences (reference `datasets/climate.py:8-39`,
    `simu.py:7-47`): one file per trajectory, [T,H,W] or [T,H,W,C];
    min-max normalized to [0,1], grayscale expanded to 3 channels."""

    def __init__(self, root: str, seq_len: int = 7, train: bool = True):
        self.files = sorted(str(p) for p in Path(root).rglob("*.npy"))
        if not self.files:
            raise FileNotFoundError(f"no .npy trajectories under {root}")
        self.seq_len = seq_len
        self.train = train

    def __len__(self):
        return len(self.files)

    def __getitem__(self, idx: int, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        rng = rng or np.random.RandomState()
        arr = np.load(self.files[idx]).astype(np.float32)
        if arr.ndim == 3:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        lo, hi = float(arr.min()), float(arr.max())
        arr = (arr - lo) / (hi - lo + 1e-8)
        t0 = rng.randint(0, max(1, arr.shape[0] - self.seq_len + 1)) if self.train else 0
        return arr[t0 : t0 + self.seq_len]


class MovingMNISTDataset:
    """Standard `mnist_test_seq.npy` (20,N,64,64) moving-MNIST file
    (reference `datasets/moving_mnist.py` after its auto-download,
    `load_dataset.py:165-208`)."""

    def __init__(self, path: str, seq_len: int = 10, train: bool = True):
        p = Path(path)
        if p.is_dir():
            p = p / "mnist_test_seq.npy"
        data = np.load(str(p))  # (T, N, 64, 64)
        split = int(data.shape[1] * 0.9)
        self.data = data[:, :split] if train else data[:, split:]
        self.seq_len = seq_len
        self.train = train

    def __len__(self):
        return self.data.shape[1]

    def __getitem__(self, idx: int, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        rng = rng or np.random.RandomState()
        T = self.data.shape[0]
        t0 = rng.randint(0, T - self.seq_len + 1) if self.train else 0
        seq = self.data[t0 : t0 + self.seq_len, idx].astype(np.float32) / 255.0
        return np.repeat(seq[..., None], 3, axis=-1)


class BouncingBallDataset:
    """Procedural bouncing-ball clips (reference `datasets/bouncing_ball`
    + its creator script): deterministic per (seed, index)."""

    def __init__(self, num_items: int = 1024, seq_len: int = 10, size: int = 32,
                 n_balls: int = 2, seed: int = 0, train: bool = True):
        self.num_items = num_items
        self.seq_len = seq_len
        self.size = size
        self.n_balls = n_balls
        self.seed = seed if train else seed + 1_000_003

    def __len__(self):
        return self.num_items

    def __getitem__(self, idx: int, rng: Optional[np.random.RandomState] = None) -> np.ndarray:
        g = np.random.RandomState((self.seed * 7919 + idx) & 0x7FFFFFFF)
        s, r = self.size, max(2, self.size // 16)
        pos = g.uniform(r, s - r, (self.n_balls, 2))
        vel = g.uniform(-2.0, 2.0, (self.n_balls, 2))
        yy, xx = np.mgrid[0:s, 0:s]
        frames = np.zeros((self.seq_len, s, s), np.float32)
        for t in range(self.seq_len):
            for bidx in range(self.n_balls):
                cy, cx = pos[bidx]
                frames[t] += ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)
            pos += vel
            for d in range(2):
                over = pos[:, d] > s - r
                under = pos[:, d] < r
                pos[over, d], pos[under, d] = 2 * (s - r) - pos[over, d], 2 * r - pos[under, d]
                vel[over | under, d] *= -1.0
        frames = np.clip(frames, 0.0, 1.0)
        return np.repeat(frames[..., None], 3, axis=-1)


# Video/physics names from the reference zoo (`data/datasets/*`, SURVEY
# §2.8): served by the generic sequence datasets above. They are not on
# any code path of the image codec.
_FRAME_FOLDER_NAMES = frozenset({"kth_actions", "bair", "big", "youtube", "uvg", "audi", "city"})
_NPY_NAMES = frozenset({"climate", "simu"})


def load_dataset(name: str, path: str, train: bool = True, img_size: int = 256,
                 hflip: bool = False):
    """Name-switch dataset factory (reference `load_dataset.py:11` shape).

    Train stacks: random crop to `img_size` (+ optional hflip); eval
    stacks follow the reference's deterministic per-dataset pipelines.
    """
    name = name.lower()
    if name in _FRAME_FOLDER_NAMES:
        tfs = [RandomCrop(img_size)] if train else [CenterCrop(img_size)]
        return FrameSequenceDataset(path, train=train, transforms=tfs)
    if name in _NPY_NAMES:
        return NpySequenceDataset(path, train=train)
    if name in ("moving_mnist", "stochastic_moving_mnist"):
        return MovingMNISTDataset(path, train=train)
    if name == "bouncing_ball":
        return BouncingBallDataset(train=train)
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
