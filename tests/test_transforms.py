"""Sequence/image transform zoo (reference misc_data_util/transforms.py)."""

import numpy as np
import pytest

from cdc_compression_tpu.data import transforms as T


def _seq(n=4, h=20, w=30, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, (n, h, w, c), dtype=np.uint8)


class TestSpatial:
    def test_seq_random_crop_shared_window(self):
        x = _seq()
        out = T.SeqRandomCrop((8, 6))(x, np.random.RandomState(0))  # (w=8, h=6)
        assert out.shape == (4, 6, 8, 3)
        # same window across frames: crop of frame k must be a sub-array of it
        full = x
        found = [
            np.array_equal(out[k], full[k, i : i + 6, j : j + 8])
            for k in range(4)
            for i in range(20 - 6 + 1)
            for j in range(30 - 8 + 1)
            if np.array_equal(out[0], full[0, i : i + 6, j : j + 8])
        ]
        assert found and all(found)

    def test_black_trim(self):
        img = np.zeros((32, 32, 3), np.uint8)
        img[8:24, 8:24] = 200
        trimmed = T.trim_uniform_border(img)
        assert trimmed.shape == (16, 16, 3)
        # too-small interior falls back to no trim
        out = T.SeqRandomCrop((20, 20), black_trim=True)([img], np.random.RandomState(0))
        assert out[0].shape == (20, 20, 3)

    def test_segment_crops(self):
        x = _seq()
        out = T.SegmentCrop(10, 12)(x, np.random.RandomState(1))
        assert out.shape == (4, 10, 12, 3)
        fixed = T.FixedSegmentCrop(10, 12)(x)
        np.testing.assert_array_equal(fixed, x[:, :10, :12])
        with pytest.raises(ValueError):
            T.SegmentCrop(100, 12)(x, np.random.RandomState(1))

    def test_centercrop_list(self):
        x = [f for f in _seq(h=21, w=31)]
        out = T.CentercropList(15)(x)
        assert len(out) == 4 and out[0].shape == (15, 15, 3)

    def test_rotation_shared_angle(self):
        x = _seq(h=16, w=16)
        out = T.RandomRotation(15)(x, np.random.RandomState(0))
        assert out.shape == x.shape


class TestResize:
    def test_vfresize_int_short_side(self):
        x = _seq(h=20, w=40)
        out = T.VFResize(10)(x)
        assert out.shape == (4, 10, 20, 3)

    def test_vfresize_tuple_exact(self):
        out = T.VFResize((12, 14))(_seq())
        assert out.shape == (4, 12, 14, 3)

    def test_resize_frame_seq_and_min(self):
        x = _seq(h=20, w=30)
        assert T.ResizeFrameSeq(8, 8)(x).shape == (4, 8, 8, 3)
        assert T.ResizeSeqMin(10)(x).shape == (4, 10, 15, 3)

    def test_resize_preserves_float_scale(self):
        x = _seq(h=20, w=30).astype(np.float32) / 255.0
        out = T.ResizeFrameSeq(8, 8)(x)
        assert out.dtype == np.float32 and out.max() <= 1.0


class TestTemporalAndMisc:
    def test_sequence_crops(self):
        x = _seq(n=10)
        out = T.RandomSequenceCrop(4)(x, np.random.RandomState(0))
        assert out.shape[0] == 4
        np.testing.assert_array_equal(T.FixedSequenceCrop(3, 2)(x), x[2:5])
        with pytest.raises(ValueError):
            T.RandomSequenceCrop(99)(x, np.random.RandomState(0))

    def test_concat_and_to_tensor(self):
        frames = [f for f in _seq(n=3)]
        stacked = T.ConcatSequence()(frames)
        assert stacked.shape == (3, 20, 30, 3)
        f = T.ImageToTensor()(stacked)
        assert f.dtype == np.float32 and 0.0 <= f.min() and f.max() <= 1.0

    def test_normalize(self):
        x = np.full((2, 4, 4, 3), 128, np.uint8)
        out = T.Normalize(128.0, 64.0)(x)
        np.testing.assert_allclose(out, 0.0)
        per_ch = T.NormalizeImage(
            np.array([0.0, 128.0, 255.0]), np.array([1.0, 1.0, 1.0])
        )(x)
        np.testing.assert_allclose(per_ch[0, 0, 0], [128.0, 0.0, -127.0])

    def test_channel_last(self):
        x = np.zeros((5, 3, 8, 9), np.float32)
        assert T.ChannelLast()(x).shape == (5, 8, 9, 3)
        assert T.ChannelLast()(x[0]).shape == (8, 9, 3)

    def test_bin_sequence(self):
        x = np.arange(10)
        out = T.BinSequence(3)(x)
        assert out.shape == (3, 3)
        np.testing.assert_array_equal(out[0], [0, 1, 2])

    def test_compose_threads_rng(self):
        stack = T.Compose([T.RandomSequenceCrop(2), T.SegmentCrop(8, 8), T.ImageToTensor()])
        a = stack(_seq(n=6), np.random.RandomState(7))
        b = stack(_seq(n=6), np.random.RandomState(7))
        np.testing.assert_array_equal(a, b)
        assert a.shape == (2, 8, 8, 3)


class TestSynthImage:
    def test_render_is_deterministic_and_matches_committed_png(self):
        """The committed held-out eval image (runs/data_heldout/synth1.png)
        must stay reproducible from tools/synth_image.py — RD held-out
        columns cite it as provably outside every training set."""
        import hashlib
        import pathlib
        import sys

        sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "tools"))
        from synth_image import render

        a = render()
        assert a.shape == (512, 768, 3) and a.dtype == np.uint8
        assert hashlib.sha256(a.tobytes()).hexdigest().startswith("6bc12ca84a9f7c9b")
        png = pathlib.Path(__file__).parent.parent / "runs/data_heldout/synth1.png"
        if png.exists():
            from PIL import Image

            np.testing.assert_array_equal(np.asarray(Image.open(png)), a)
