"""End-to-end bitstream codec tests: bytes in, exact latents out."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cdc_compression_tpu import models
from cdc_compression_tpu.diffusion import DiffusionConfig, GaussianDiffusion
from cdc_compression_tpu.entropy.codec import CodecTables, ImageCodec


@pytest.fixture(scope="module")
def small_codec():
    unet = models.Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,),
                       channels=3, context_channels=3)
    comp = models.BigCompressor(dim=8, dim_mults=(1, 2, 3, 4), hyper_dims_mults=(4, 4, 4),
                                channels=3, out_channels=3)
    cfg = DiffusionConfig(num_timesteps=64, var_schedule="linear", pred_mode="noise",
                          loss_type="l1", clip_noise="none")
    engine = GaussianDiffusion(unet, comp, cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    comp_p = comp.init(k2, x)
    ctx = comp.apply(comp_p, x)["output"]
    unet_p = unet.init(k1, x, jnp.zeros((1, 1)), ctx[:1])
    params = {"unet": unet_p, "compressor": comp_p}
    return ImageCodec(engine, params)


class TestBitstream:
    def test_latents_roundtrip_exactly(self, small_codec):
        rng = np.random.RandomState(0)
        img = rng.rand(64, 64, 3).astype(np.float32)
        data = small_codec.encode(img)
        assert isinstance(data, bytes) and len(data) > 17

        # ground truth from the analytic path
        x = jnp.asarray(img)[None] * 2 - 1
        q_hyper_t, q_latent_t, _, _ = small_codec._encode_jit(x)

        q_hyper, q_latent, (H, W), scale = small_codec.decode_latents(data)
        assert scale is None
        assert (H, W) == (64, 64)
        np.testing.assert_array_equal(np.asarray(q_hyper), np.asarray(q_hyper_t))
        np.testing.assert_array_equal(np.asarray(q_latent), np.asarray(q_latent_t))

    def test_decoded_image_matches_analytic_path(self, small_codec):
        """Decoding from bytes must equal decoding from the in-memory
        latents (same jitted DDIM program, same rng). Exact because the
        bitstream reproduces q_latent bit-for-bit (roundtrip test above)
        and both paths then run the identical compiled program — an
        eager re-derivation would differ by compilation-order float
        noise, which an untrained net amplifies chaotically."""
        rng = np.random.RandomState(1)
        img = rng.rand(64, 64, 3).astype(np.float32)
        data = small_codec.encode(img)
        out = small_codec.decode(data, sample_steps=3, rng=jax.random.PRNGKey(7))

        x = jnp.asarray(img)[None] * 2 - 1
        _, q_latent_t, _, _ = small_codec._encode_jit(x)
        want = small_codec.decode_from_latents(
            q_latent_t, (64, 64), sample_steps=3, rng=jax.random.PRNGKey(7)
        )
        np.testing.assert_array_equal(out, want)

    def test_bitrate_sane(self, small_codec):
        rng = np.random.RandomState(2)
        img = rng.rand(64, 64, 3).astype(np.float32)
        data = small_codec.encode(img)
        bpp = len(data) * 8 / (64 * 64)
        assert 0 < bpp < 24  # lossless-of-noise upper bound sanity

    def test_vbr_bitstream_roundtrip(self):
        """VBR models: the bitrate_scale conditions the transforms and
        rides the CDC2 header; latents roundtrip exactly per scale."""
        unet = models.Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,),
                           channels=3, context_channels=3)
        comp = models.BigCompressor(dim=8, dim_mults=(1, 2, 3, 4),
                                    hyper_dims_mults=(4, 4, 4),
                                    channels=3, out_channels=3, vbr=True)
        cfg = DiffusionConfig(num_timesteps=64, var_schedule="linear",
                              pred_mode="noise", loss_type="l1", clip_noise="none",
                              vbr=True)
        engine = GaussianDiffusion(unet, comp, cfg)
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        x = jnp.zeros((1, 64, 64, 3))
        cond0 = jnp.full((1,), 0.5, jnp.float32)
        comp_p = comp.init(k2, x, cond0)
        ctx = comp.apply(comp_p, x, cond0)["output"]
        unet_p = unet.init(k1, x, jnp.zeros((1, 1)), ctx[:1])
        codec = ImageCodec(engine, {"unet": unet_p, "compressor": comp_p})

        img = np.random.RandomState(4).rand(64, 64, 3).astype(np.float32)
        for s in (0.0, 1.0):
            data = codec.encode(img, bitrate_scale=s)
            assert data[:4] == b"CDC2"
            qh, ql, (H, W), s_back = codec.decode_latents(data)
            assert s_back == pytest.approx(s)
            cond = jnp.full((1,), s, jnp.float32)
            qh_t, ql_t, _, _ = codec._encode_jit(jnp.asarray(img)[None] * 2 - 1, cond)
            np.testing.assert_array_equal(np.asarray(qh), np.asarray(qh_t))
            np.testing.assert_array_equal(np.asarray(ql), np.asarray(ql_t))
            out = codec.decode(data, sample_steps=2)
            assert out.shape == (64, 64, 3) and np.isfinite(out).all()
        # the two scales must produce different conditioned streams
        d0 = codec.encode(img, bitrate_scale=0.0)
        d1 = codec.encode(img, bitrate_scale=1.0)
        assert d0 != d1

    @pytest.mark.parametrize(
        "dim_mults,hyper_mults",
        [((1, 2, 3), (4, 4, 4)), ((1, 2, 3, 4), (4, 4))],
        ids=["enc3stage", "hyper2stage"],
    )
    def test_nondefault_stride_roundtrip(self, dim_mults, hyper_mults):
        """The container derives grid shapes from the compressor config
        (`latent_downsample`/`hyper_downsample`) instead of assuming the
        default 4+3-stride geometry — round-trip must hold for other
        stage counts."""
        unet = models.Unet(dim=8, dim_mults=(1, 2), context_dim_mults=(1,),
                           channels=3, context_channels=3)
        comp = models.BigCompressor(dim=8, dim_mults=dim_mults,
                                    hyper_dims_mults=hyper_mults,
                                    channels=3, out_channels=3)
        cfg = DiffusionConfig(num_timesteps=64, var_schedule="linear",
                              pred_mode="noise", loss_type="l1", clip_noise="none")
        engine = GaussianDiffusion(unet, comp, cfg)
        x = jnp.zeros((1, 64, 64, 3))
        comp_p = comp.init(jax.random.PRNGKey(2), x)
        codec = ImageCodec(engine, {"unet": None, "compressor": comp_p})

        img = np.random.RandomState(5).rand(64, 64, 3).astype(np.float32)
        data = codec.encode(img)
        qh, ql, (H, W), _ = codec.decode_latents(data)
        assert (H, W) == (64, 64)
        ds_h, ds_l = comp.hyper_downsample, comp.latent_downsample
        assert qh.shape[1:3] == (64 // ds_h, 64 // ds_h)
        assert ql.shape[1:3] == (64 // ds_l, 64 // ds_l)
        qh_t, ql_t, _, _ = codec._encode_jit(jnp.asarray(img)[None] * 2 - 1)
        np.testing.assert_array_equal(np.asarray(qh), np.asarray(qh_t))
        np.testing.assert_array_equal(np.asarray(ql), np.asarray(ql_t))

    def test_unaligned_image_rejected(self, small_codec):
        img = np.zeros((60, 64, 3), np.float32)
        with pytest.raises(ValueError, match="multiple of the hyper stride"):
            small_codec.encode(img)

    def test_corrupt_magic_rejected(self, small_codec):
        rng = np.random.RandomState(3)
        img = rng.rand(64, 64, 3).astype(np.float32)
        data = bytearray(small_codec.encode(img))
        data[0] = 0
        with pytest.raises(AssertionError):
            small_codec.decode_latents(bytes(data))


class TestBatchedServing:
    """Batched serving path: one device dispatch per batch. The
    bitstream/latent path is bit-identical to the per-image API;
    decoded images match up to cross-program float noise (the batched
    program tiles convs for (B,...) vs the per-image (1,...) program —
    an iterated DDIM loop on an UNTRAINED net amplifies that ~1-ulp
    noise chaotically, so image parity is asserted at 1 denoise step
    where the comparison is well-conditioned)."""

    def test_encode_batch_bytes_match_per_image(self, small_codec):
        rng = np.random.RandomState(4)
        imgs = [rng.rand(64, 64, 3).astype(np.float32) for _ in range(3)]
        batched = small_codec.encode_batch(imgs)
        singles = [small_codec.encode(im) for im in imgs]
        assert batched == singles

    def test_decode_batch_matches_per_image(self, small_codec):
        rng = np.random.RandomState(5)
        imgs = [rng.rand(64, 64, 3).astype(np.float32) for _ in range(2)]
        payloads = small_codec.encode_batch(imgs)
        keys = [jax.random.PRNGKey(11), jax.random.PRNGKey(22)]
        got = small_codec.decode_batch(payloads, sample_steps=1, rngs=keys)
        assert got.shape == (2, 64, 64, 3)
        for i, (p, k) in enumerate(zip(payloads, keys)):
            want = small_codec.decode(p, sample_steps=1, rng=k)
            # measured cross-program noise on this untrained net: 2.4e-4
            # max over 0.2% of pixels (LN stats amplify conv tiling ulps)
            np.testing.assert_allclose(got[i], want, atol=1e-3)

    def test_uint8_io_matches_float_path(self, small_codec):
        """uint8 ingest (normalized on device) must produce byte-identical
        bitstreams to the float path on the same pixels, and
        output_uint8 must equal host-side round(clip(float)*255)."""
        rng = np.random.RandomState(8)
        u8 = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        img = u8.astype(np.float32) / 255.0
        assert small_codec.encode(u8) == small_codec.encode(img)
        assert small_codec.encode_batch([u8]) == [small_codec.encode(img)]

        data = small_codec.encode(img)
        k = jax.random.PRNGKey(5)
        f = small_codec.decode(data, sample_steps=2, rng=k)
        q = small_codec.decode(data, sample_steps=2, rng=k, output_uint8=True)
        assert q.dtype == np.uint8
        np.testing.assert_array_equal(q, np.round(f * 255).astype(np.uint8))
        qb = small_codec.decode_batch([data], sample_steps=2, rngs=[k],
                                      output_uint8=True)
        assert qb.dtype == np.uint8 and qb.shape == (1, 64, 64, 3)

    def test_decode_batch_rows_independent(self, small_codec):
        """Within ONE compiled batch program: duplicate (payload, key)
        rows must decode bit-identically (the lax.map body is
        deterministic and rows don't couple), and the multi-step path
        runs end to end."""
        rng = np.random.RandomState(7)
        img = rng.rand(64, 64, 3).astype(np.float32)
        (p,) = small_codec.encode_batch([img])
        k = jax.random.PRNGKey(3)
        got = small_codec.decode_batch([p, p], sample_steps=3, rngs=[k, k])
        np.testing.assert_array_equal(got[0], got[1])

    def test_decode_batch_guards(self, small_codec):
        rng = np.random.RandomState(6)
        img = rng.rand(64, 64, 3).astype(np.float32)
        data = small_codec.encode(img)
        with pytest.raises(ValueError, match="same-shape"):
            small_codec.encode_batch([img, img[:32]])
        # a fake VBR payload mixed with a plain one must raise
        from cdc_compression_tpu.entropy import codec as codec_mod
        import struct as _s
        H, W, h_b, l_b, _ = codec_mod.ImageCodec._parse_container(data)
        vbr = (codec_mod._MAGIC_VBR
               + _s.pack("<IIBIIf", H, W, 0, len(h_b), len(l_b), 1.0)
               + h_b + l_b)
        with pytest.raises(ValueError, match="mix"):
            small_codec.decode_batch([data, vbr], sample_steps=2)


class TestSequenceDatasets:
    def test_frame_sequence_dataset(self, tmp_path):
        from PIL import Image
        from cdc_compression_tpu.data.datasets import FrameSequenceDataset, RandomCrop

        for clip in range(2):
            d = tmp_path / f"clip{clip}"
            d.mkdir()
            for t in range(5):
                Image.fromarray(
                    (np.random.RandomState(clip * 10 + t).rand(40, 48, 3) * 255).astype(np.uint8)
                ).save(d / f"{t:03d}.png")
        ds = FrameSequenceDataset(str(tmp_path), seq_len=3, train=True, transforms=[RandomCrop(32)])
        assert len(ds) == 2
        seq = ds.__getitem__(0, rng=np.random.RandomState(0))
        assert seq.shape == (3, 32, 32, 3) and seq.dtype == np.float32
        # eval mode: deterministic head crop
        ds_e = FrameSequenceDataset(str(tmp_path), seq_len=3, train=False)
        a = ds_e.__getitem__(1, rng=np.random.RandomState(1))
        b = ds_e.__getitem__(1, rng=np.random.RandomState(2))
        np.testing.assert_array_equal(a, b)

    def test_npy_sequence_dataset(self, tmp_path):
        from cdc_compression_tpu.data.datasets import NpySequenceDataset

        np.save(tmp_path / "traj.npy", np.random.RandomState(0).rand(9, 16, 16).astype(np.float32))
        ds = NpySequenceDataset(str(tmp_path), seq_len=4, train=False)
        seq = ds.__getitem__(0)
        assert seq.shape == (4, 16, 16, 3)
        assert seq.min() >= 0.0 and seq.max() <= 1.0

    def test_bouncing_ball(self):
        from cdc_compression_tpu.data.datasets import BouncingBallDataset

        ds = BouncingBallDataset(num_items=4, seq_len=5, size=32)
        a = ds.__getitem__(2)
        b = ds.__getitem__(2)
        np.testing.assert_array_equal(a, b)  # deterministic per index
        assert a.shape == (5, 32, 32, 3) and a.max() <= 1.0
        assert a.sum() > 0  # balls drawn

    def test_moving_mnist(self, tmp_path):
        from cdc_compression_tpu.data.datasets import MovingMNISTDataset

        np.save(tmp_path / "mnist_test_seq.npy",
                (np.random.RandomState(0).rand(20, 10, 64, 64) * 255).astype(np.uint8))
        ds = MovingMNISTDataset(str(tmp_path), seq_len=6, train=True)
        assert len(ds) == 9
        seq = ds.__getitem__(0, rng=np.random.RandomState(0))
        assert seq.shape == (6, 64, 64, 3)


class TestConverters:
    def test_bair_tfrecord_roundtrip(self, tmp_path):
        """Synthetic BAIR-layout TFRecord -> PNG clip folders -> dataset."""
        from PIL import Image
        from cdc_compression_tpu.data import converters
        from cdc_compression_tpu.data.datasets import FrameSequenceDataset

        rng = np.random.RandomState(0)
        payloads = []
        truth = []
        for clip in range(2):
            feats = {}
            frames = []
            for t in range(4):
                img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
                frames.append(img)
                feats[f"{t}/image_aux1/encoded"] = [img.tobytes()]
            truth.append(frames)
            payloads.append(converters.encode_example(feats))
        rec_dir = tmp_path / "records"; rec_dir.mkdir()
        converters.write_tfrecord(str(rec_dir / "traj.tfrecord"), payloads)

        out_dir = tmp_path / "frames"
        n = converters.convert_bair(str(rec_dir), str(out_dir))
        assert n == 2
        back = np.asarray(Image.open(out_dir / "clip_000000" / "0002.png"))
        np.testing.assert_array_equal(back, truth[0][2])
        ds = FrameSequenceDataset(str(out_dir), seq_len=4, train=False)
        assert ds.__getitem__(1).shape == (4, 64, 64, 3)

    def test_parse_example_int64_and_float(self):
        """Wire parser handles varint fields (hand-encoded)."""
        from cdc_compression_tpu.data import converters

        # Example{features{feature{key:"n" Feature{int64_list{value:[7,300]}}}}}
        def varint(v):
            out = b""
            while True:
                b7 = v & 0x7F; v >>= 7
                out += bytes([b7 | (0x80 if v else 0)])
                if not v: return out
        def ld(f, p): return varint((f << 3) | 2) + varint(len(p)) + p
        int64_list = varint((1 << 3) | 0) + varint(7) + varint((1 << 3) | 0) + varint(300)
        feature = ld(3, int64_list)
        entry = ld(1, b"n") + ld(2, feature)
        ex = ld(1, ld(1, entry))
        parsed = converters.parse_example(ex)
        assert parsed == {"n": [7, 300]}

    def test_convert_video_frames_gif(self, tmp_path):
        iio = pytest.importorskip("imageio.v3")
        from cdc_compression_tpu.data import converters

        frames = (np.random.RandomState(0).rand(5, 32, 32, 3) * 255).astype(np.uint8)
        iio.imwrite(str(tmp_path / "clip.gif"), frames)
        n = converters.convert_video_frames(str(tmp_path / "clip.gif"), str(tmp_path / "out"))
        assert n == 5
