"""Python driver for the native rANS coder: CDF tables + (de)compression.

This supplies what the reference outsources-and-skips (SURVEY §2.12): a
real bitstream for the two latent tensors.

* Factorized hyper-prior stream: one CDF table per channel, built by
  discretizing `FlexiblePrior.cdf` on an integer grid around the learned
  medians.
* Gaussian conditional stream: symbols `round(latent - mean)` indexed by
  a 64-entry log-spaced scale table (CDFs from the standard-normal CDF),
  the same construction compressai uses, so analytic bpp and real bits
  agree to ~1%.

All table building is host-side numpy; encode/decode calls the C++
library through ctypes (zero-copy on contiguous int32/uint32 arrays).
"""

from __future__ import annotations

import ctypes
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from .build import build

_PROB_BITS = 16
_PROB_SCALE = 1 << _PROB_BITS


class _Lib:
    _lib = None

    @classmethod
    def get(cls):
        if cls._lib is None:
            lib = ctypes.CDLL(str(build()))
            lib.rans_encode.restype = ctypes.c_int64
            lib.rans_encode.argtypes = [
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
            ]
            lib.rans_decode.restype = ctypes.c_int64
            lib.rans_decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int32),
            ]
            cls._lib = lib
        return cls._lib


def pmf_to_quantized_cdf(pmf: np.ndarray, tail_mass: float = 1e-9) -> np.ndarray:
    """Quantize a pmf (plus an escape slot) to a 16-bit integer CDF.

    Every slot gets frequency >= 1 (stealing from the largest slots), so
    any symbol remains codable. Returns int CDF of length len(pmf)+2:
    [0, ..., 2^16] with the last slot being the escape slot.
    """
    pmf = np.clip(np.asarray(pmf, np.float64), 0.0, None)
    extra = max(tail_mass, 1.0 - pmf.sum())
    full = np.concatenate([pmf, [extra]])
    full = full / full.sum()
    freqs = np.round(full * _PROB_SCALE).astype(np.int64)
    freqs = np.maximum(freqs, 1)
    # fix the total by adjusting the largest bins
    diff = _PROB_SCALE - freqs.sum()
    while diff != 0:
        i = int(np.argmax(freqs)) if diff < 0 else int(np.argmax(full))
        step = np.sign(diff)
        if freqs[i] + step < 1:
            candidates = np.where(freqs > 1)[0]
            i = int(candidates[np.argmax(freqs[candidates])])
        freqs[i] += step
        diff -= step
    cdf = np.zeros(len(freqs) + 1, np.uint32)
    cdf[1:] = np.cumsum(freqs).astype(np.uint32)
    return cdf


@dataclass
class CdfTable:
    """Indexed CDF tables in the layout the C++ coder expects."""

    cdfs: np.ndarray  # (ncdfs, max_len+1) uint32
    sizes: np.ndarray  # (ncdfs,) int32 — symbol slots incl. escape
    offsets: np.ndarray  # (ncdfs,) int32 — value of slot 0

    @staticmethod
    def from_pmfs(pmfs, offsets) -> "CdfTable":
        cdf_list = [pmf_to_quantized_cdf(p) for p in pmfs]
        sizes = np.array([len(c) - 1 for c in cdf_list], np.int32)
        max_len = max(len(c) for c in cdf_list)
        cdfs = np.zeros((len(cdf_list), max_len), np.uint32)
        for i, c in enumerate(cdf_list):
            cdfs[i, : len(c)] = c
            cdfs[i, len(c):] = c[-1]
        return CdfTable(cdfs=cdfs, sizes=sizes, offsets=np.asarray(offsets, np.int32))


def encode_symbols(symbols: np.ndarray, indexes: np.ndarray, table: CdfTable) -> bytes:
    lib = _Lib.get()
    symbols = np.ascontiguousarray(symbols.ravel(), np.int32)
    indexes = np.ascontiguousarray(indexes.ravel(), np.int32)
    assert symbols.shape == indexes.shape
    n = symbols.size
    capacity = max(1024, n * 8 + 1024)
    out = np.empty(capacity, np.uint8)
    written = lib.rans_encode(
        symbols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        np.ascontiguousarray(table.cdfs).ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        np.ascontiguousarray(table.sizes).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.ascontiguousarray(table.offsets).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        table.cdfs.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        capacity,
    )
    if written < 0:
        raise RuntimeError("rans_encode: output capacity exceeded")
    return bytes(out[:written])


def decode_symbols(data: bytes, indexes: np.ndarray, table: CdfTable) -> np.ndarray:
    lib = _Lib.get()
    indexes = np.ascontiguousarray(indexes.ravel(), np.int32)
    n = indexes.size
    buf = np.frombuffer(data, np.uint8)
    out = np.empty(n, np.int32)
    got = lib.rans_decode(
        np.ascontiguousarray(buf).ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        buf.size,
        indexes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n,
        np.ascontiguousarray(table.cdfs).ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        np.ascontiguousarray(table.sizes).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        np.ascontiguousarray(table.offsets).ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        table.cdfs.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    assert got == n
    return out


# ---------------------------------------------------------------------------
# table builders for the two streams
# ---------------------------------------------------------------------------

# Table floor == the compressor's conditional-scale clamp (`models/
# compressor.py` NormalParams scale >= 0.1, matching the reference's
# `scale.clamp(min=0.1)`, epsilonparam/modules/compress_modules.py:65).
# compressai's released table starts at 0.11, but pairing a 0.11 table
# floor with a 0.1 model clamp would code every scale in [0.1, 0.11)
# against a mismatched wider CDF; 0.1 keeps the table and clamp aligned.
SCALES_MIN = 0.1
SCALES_MAX = 256.0
SCALES_LEVELS = 64


def scale_table() -> np.ndarray:
    return np.exp(
        np.linspace(np.log(SCALES_MIN), np.log(SCALES_MAX), SCALES_LEVELS)
    )


def _std_cdf(x):
    from scipy.special import erfc

    return 0.5 * erfc(-(2 ** -0.5) * x)


def build_gaussian_tables(tail_sigma: float = 9.0, max_half: int = 256) -> CdfTable:
    """Per-scale-bin CDFs over symbols centered at 0 (mean-removed)."""
    scales = scale_table()
    pmfs, offsets = [], []
    for s in scales:
        half = int(min(max(np.ceil(s * tail_sigma), 2), max_half))
        grid = np.arange(-half, half + 1, dtype=np.float64)
        pmf = _std_cdf((grid + 0.5) / s) - _std_cdf((grid - 0.5) / s)
        pmfs.append(pmf)
        offsets.append(-half)
    return CdfTable.from_pmfs(pmfs, offsets)


def scale_indexes(scale: np.ndarray) -> np.ndarray:
    """Map each element's scale to the smallest table scale >= it
    (compressai convention)."""
    table = scale_table()
    idx = np.searchsorted(table, np.asarray(scale, np.float64), side="left")
    return np.clip(idx, 0, SCALES_LEVELS - 1).astype(np.int32)


def build_prior_tables(cdf_fn, medians: np.ndarray, half_range: int = 64) -> CdfTable:
    """Per-channel CDFs for the factorized hyper-prior.

    `cdf_fn(x: (N, C)) -> (N, C)` evaluates the FlexiblePrior CDF (host
    call, done once after training/model load). Symbols are integers
    relative to round-with-offset around medians: q = round(h - m) + m,
    so symbol s corresponds to value s + m.
    """
    C = medians.shape[-1]
    m = medians.reshape(1, C)
    grid = np.arange(-half_range, half_range + 1, dtype=np.float64).reshape(-1, 1)
    pts_upper = grid + 0.5 + m
    pts_lower = grid - 0.5 + m
    upper = np.asarray(cdf_fn(pts_upper))
    lower = np.asarray(cdf_fn(pts_lower))
    pmf = np.clip(upper - lower, 0.0, 1.0)  # (N, C)
    pmfs = [pmf[:, c] for c in range(C)]
    offsets = [-half_range] * C
    return CdfTable.from_pmfs(pmfs, offsets)
