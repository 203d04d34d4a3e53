from .datasets import (
    CenterCrop,
    ImageFolderDataset,
    PadToMultiple,
    RandomCrop,
    RandomHorizontalFlip,
    Resize,
    VimeoDataset,
    load_dataset,
)
from .loader import Loader, cycle

__all__ = [
    "CenterCrop",
    "ImageFolderDataset",
    "Loader",
    "PadToMultiple",
    "RandomCrop",
    "RandomHorizontalFlip",
    "Resize",
    "VimeoDataset",
    "cycle",
    "load_dataset",
]
