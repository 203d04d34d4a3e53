"""Dataset prep converters (reference `data/misc_data_util/`).

* `convert_bair` — BAIR robot-pushing TFRecords -> per-clip PNG frame
  folders (reference `convert_bair.py:1-35`, which uses TensorFlow).
  TensorFlow is not a dependency here: TFRecord framing and the
  `tf.train.Example` protobuf wire format are parsed directly (~60
  lines), which is all the reference actually used TF for.
* `convert_video_frames` — video file -> PNG frame folder (reference
  `convert_kth_actions.py` used moviepy; gated on imageio availability).
* `url_save` — download-with-progress (reference `url_save.py:1-26`).

The written frame folders are exactly what `datasets.FrameSequenceDataset`
consumes.
"""

from __future__ import annotations

import os
import struct
import urllib.request
from pathlib import Path
from typing import Dict, Iterator, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# TFRecord framing + tf.train.Example wire format (no TensorFlow)
# ---------------------------------------------------------------------------


def read_tfrecords(path: str) -> Iterator[bytes]:
    """Yield raw record payloads from a TFRecord file.

    Framing per record: u64 length, u32 masked-crc(length), payload,
    u32 masked-crc(payload). CRCs are not verified (we have no crc32c
    dependency); lengths are validated instead.
    """
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                return
            (length,) = struct.unpack("<Q", head)
            f.read(4)  # length crc
            payload = f.read(length)
            if len(payload) < length:
                raise IOError(f"truncated TFRecord in {path}")
            f.read(4)  # payload crc
            yield payload


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes]]:
    """Yield (field_number, wire_type, value_bytes) for a protobuf message.

    Only wire types 0 (varint) and 2 (length-delimited) occur in
    Example/Features/Feature messages; type-5/1 are skipped defensively.
    """
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:
            v, pos = _read_varint(buf, pos)
            yield field, wt, v
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            yield field, wt, buf[pos : pos + ln]
            pos += ln
        elif wt == 5:
            pos += 4
        elif wt == 1:
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


def parse_example(payload: bytes) -> Dict[str, List]:
    """Parse a serialized `tf.train.Example` into {key: list-of-values}.

    Values are bytes (bytes_list), float (float_list), or int
    (int64_list), matching the Feature oneof.
    """
    out: Dict[str, List] = {}
    for f_ex, _, features_buf in _iter_fields(payload):
        if f_ex != 1:  # Example.features
            continue
        for f_feat, _, entry in _iter_fields(features_buf):
            if f_feat != 1:  # Features.feature (map entry)
                continue
            key = None
            values: List = []
            for f_kv, _, v in _iter_fields(entry):
                if f_kv == 1:
                    key = v.decode()
                elif f_kv == 2:  # Feature
                    for f_list, _, list_buf in _iter_fields(v):
                        for _, wt, item in _iter_fields(list_buf):
                            if f_list == 1:  # bytes_list.value
                                values.append(item)
                            elif f_list == 2:  # float_list.value (packed f32)
                                values.extend(
                                    struct.unpack(f"<{len(item)//4}f", item)
                                ) if wt == 2 else values.append(item)
                            elif f_list == 3:  # int64_list.value
                                if wt == 0:
                                    values.append(item)
                                else:  # packed varints
                                    p = 0
                                    while p < len(item):
                                        val, p = _read_varint(item, p)
                                        values.append(val)
            if key is not None:
                out[key] = values
    return out


def encode_example(features: Dict[str, List[bytes]]) -> bytes:
    """Serialize {key: [bytes,...]} as a bytes_list-only Example (test
    fixture helper — the inverse of `parse_example` for bytes features)."""

    def varint(v: int) -> bytes:
        out = b""
        while True:
            b7 = v & 0x7F
            v >>= 7
            out += bytes([b7 | (0x80 if v else 0)])
            if not v:
                return out

    def ld(field: int, payload: bytes) -> bytes:
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    entries = b""
    for key, values in features.items():
        bytes_list = b"".join(ld(1, v) for v in values)
        feature = ld(1, bytes_list)  # Feature.bytes_list
        entries += ld(1, ld(1, key.encode()) + ld(2, feature))
    return ld(1, entries)  # Example.features


def write_tfrecord(path: str, payloads: List[bytes]) -> None:
    """Write payloads with TFRecord framing (zero CRCs — `read_tfrecords`
    does not verify them). Test-fixture counterpart of `read_tfrecords`."""
    with open(path, "wb") as f:
        for p in payloads:
            f.write(struct.pack("<Q", len(p)) + b"\0" * 4 + p + b"\0" * 4)


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------


def convert_bair(
    records_dir: str,
    out_dir: str,
    image_key: str = "image_aux1/encoded",
    image_hw: Tuple[int, int] = (64, 64),
) -> int:
    """BAIR TFRecords -> per-clip PNG frame folders (convert_bair.py:1-35).

    BAIR stores raw RGB bytes per frame under keys like
    ``"{t}/image_aux1/encoded"``. Returns the number of clips written.
    """
    from PIL import Image

    h, w = image_hw
    clip = 0
    out_p = Path(out_dir)
    for rec in sorted(Path(records_dir).glob("*.tfrecord*")):
        for payload in read_tfrecords(str(rec)):
            ex = parse_example(payload)
            frames = sorted(
                (int(k.split("/")[0]), v[0])
                for k, v in ex.items()
                if k.endswith(image_key) and v
            )
            if not frames:
                continue
            d = out_p / f"clip_{clip:06d}"
            d.mkdir(parents=True, exist_ok=True)
            for t, raw in frames:
                img = np.frombuffer(raw, np.uint8)
                if img.size == h * w * 3:  # raw RGB (BAIR layout)
                    Image.fromarray(img.reshape(h, w, 3)).save(d / f"{t:04d}.png")
                else:  # already an encoded image
                    (d / f"{t:04d}.png").write_bytes(raw)
            clip += 1
    return clip


def convert_video_frames(video_path: str, out_dir: str) -> int:
    """Video file -> PNG frame folder (reference `convert_kth_actions.py`
    via moviepy). Requires imageio(-ffmpeg); raises with guidance if the
    environment lacks it."""
    try:
        import imageio.v3 as iio
    except ImportError as e:  # pragma: no cover - env-dependent
        raise RuntimeError(
            "convert_video_frames needs the optional `imageio` package "
            "(with an ffmpeg plugin); decode the video to a PNG folder "
            "with any external tool instead — FrameSequenceDataset only "
            "needs a directory of frames"
        ) from e
    from PIL import Image

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    n = 0
    for n, frame in enumerate(iio.imiter(video_path)):
        Image.fromarray(np.asarray(frame)).save(out / f"{n:05d}.png")
    return n + 1


def url_save(url: str, path: str) -> None:
    """Download with a progress line (reference `url_save.py:1-26`)."""

    def hook(blocks, block_size, total):
        done = blocks * block_size
        if total > 0:
            print(f"\r{os.path.basename(path)}: {100*done/total:5.1f}%", end="")

    urllib.request.urlretrieve(url, path, reporthook=hook)
    print()
