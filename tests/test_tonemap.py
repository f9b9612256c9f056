"""HDR -> SDR tone mapping (ops/tonemap.py) vs spec anchor values and
an independent numpy mirror. Beyond-reference module: the reference
decodes P010/P012 HDR but leaves tone mapping to the user."""

import numpy as np
import pytest

from vali_tpu.ops import tonemap

RNG = np.random.default_rng(31)


# ---------------------------------------------------------------------------
# independent numpy mirror (same specs, separate implementation)
# ---------------------------------------------------------------------------

def _np_pq_eotf(e):
    m1, m2 = 2610 / 16384, 2523 / 4096 * 128
    c1, c2, c3 = 3424 / 4096, 2413 / 4096 * 32, 2392 / 4096 * 32
    p = np.power(np.maximum(e, 0.0), 1 / m2)
    return 10000.0 * np.power(np.maximum(p - c1, 0) / (c2 - c3 * p), 1 / m1)


def _np_pq_inv(nits):
    m1, m2 = 2610 / 16384, 2523 / 4096 * 128
    c1, c2, c3 = 3424 / 4096, 2413 / 4096 * 32, 2392 / 4096 * 32
    y = np.power(np.maximum(nits, 0.0) / 10000.0, m1)
    return np.power((c1 + c2 * y) / (1 + c3 * y), m2)


def _np_hlg_inv_oetf(e):
    a = 0.17883277
    b, c = 1 - 4 * a, 0.5 - a * np.log(4 * a)
    e = np.maximum(e, 0.0)
    return np.where(e <= 0.5, e * e / 3.0, (np.exp((e - c) / a) + b) / 12.0)


class TestTransferFunctions:
    def test_pq_spec_anchors(self):
        # ST 2084: E=1.0 -> 10000 nits; E=0 -> 0; 100 nits -> ~0.5081
        assert float(tonemap.pq_eotf(np.float32(1.0))) == pytest.approx(
            10000.0, rel=1e-4)
        assert float(tonemap.pq_eotf(np.float32(0.0))) == 0.0
        assert float(tonemap.pq_inv_eotf(np.float32(100.0))) == \
            pytest.approx(0.50808, abs=1e-4)
        assert float(tonemap.pq_inv_eotf(np.float32(1000.0))) == \
            pytest.approx(0.75183, abs=1e-4)

    def test_pq_round_trip(self):
        e = RNG.uniform(0.0, 1.0, 4096).astype(np.float32)
        back = np.asarray(tonemap.pq_inv_eotf(tonemap.pq_eotf(e)))
        np.testing.assert_allclose(back, e, atol=2e-4)

    def test_pq_matches_numpy(self):
        e = RNG.uniform(0.0, 1.0, 1000).astype(np.float32)
        np.testing.assert_allclose(np.asarray(tonemap.pq_eotf(e)),
                                   _np_pq_eotf(e), rtol=2e-3)

    def test_hlg_spec_anchors(self):
        # inverse OETF: 0.5 -> 1/12 scene linear; 1.0 -> 1.0
        assert float(tonemap.hlg_inv_oetf(np.float32(0.5))) == \
            pytest.approx(1.0 / 12.0, rel=1e-5)
        assert float(tonemap.hlg_inv_oetf(np.float32(1.0))) == \
            pytest.approx(1.0, rel=1e-4)

    def test_hlg_continuous_at_half(self):
        lo = float(tonemap.hlg_inv_oetf(np.float32(0.4999)))
        hi = float(tonemap.hlg_inv_oetf(np.float32(0.5001)))
        assert abs(hi - lo) < 1e-3

    def test_hlg_matches_numpy(self):
        e = RNG.uniform(0.0, 1.0, 1000).astype(np.float32)
        np.testing.assert_allclose(np.asarray(tonemap.hlg_inv_oetf(e)),
                                   _np_hlg_inv_oetf(e), rtol=1e-4,
                                   atol=1e-6)


class TestGamut:
    def test_matrices_are_inverses(self):
        np.testing.assert_allclose(
            tonemap.BT2020_TO_BT709 @ tonemap.BT709_TO_BT2020,
            np.eye(3), atol=1e-12)

    def test_white_is_preserved(self):
        # D65 white (equal RGB in both gamuts) maps to equal RGB
        w = tonemap.BT2020_TO_BT709 @ np.ones(3)
        np.testing.assert_allclose(w, np.ones(3), atol=2e-4)

    def test_2020_primary_leaves_709_gamut(self):
        # pure BT.2020 green is outside BT.709: negative R and B
        g = tonemap.BT2020_TO_BT709 @ np.array([0.0, 1.0, 0.0])
        assert g[0] < 0 and g[2] < 0 and g[1] > 1.0


class TestToneCurves:
    @pytest.mark.parametrize("method", ["bt2390", "reinhard", "hable"])
    def test_peak_maps_to_target_and_monotone(self, method):
        import jax.numpy as jnp

        lum = np.geomspace(0.01, 1000.0, 512).astype(np.float32)
        gain = np.asarray(tonemap._tone_scale(
            jnp.asarray(lum), 1000.0, 100.0, method))
        out = lum * gain
        assert out[-1] == pytest.approx(100.0, rel=2e-3)
        assert np.all(np.diff(out) > -1e-3)  # monotone non-decreasing
        assert np.all(out <= 100.0 + 1e-2)

    def test_bt2390_identity_below_knee(self):
        import jax.numpy as jnp

        # dark pixels pass through unchanged (knee is in the highlights)
        lum = np.geomspace(0.01, 5.0, 64).astype(np.float32)
        gain = np.asarray(tonemap._tone_scale(
            jnp.asarray(lum), 1000.0, 100.0, "bt2390"))
        np.testing.assert_allclose(lum * gain, lum, rtol=1e-3)

    def test_target_above_peak_is_identity(self):
        import jax.numpy as jnp

        lum = np.geomspace(0.01, 100.0, 64).astype(np.float32)
        gain = np.asarray(tonemap._tone_scale(
            jnp.asarray(lum), 100.0, 203.0, "bt2390"))
        np.testing.assert_allclose(lum * gain, lum, rtol=1e-5)

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError, match="unknown tone-map"):
            tonemap.tonemap_batch(
                np.zeros((1, 8, 8, 3), np.float32), method="nope")


class TestTonemapBatch:
    def test_shapes_and_dtypes(self):
        rgb = RNG.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
        out = tonemap.tonemap_batch(rgb)
        assert out.shape == (2, 16, 24, 3) and out.dtype == np.uint8
        outf = np.asarray(tonemap.tonemap_batch(
            rgb, out_dtype=np.float32))
        assert outf.dtype == np.float32
        assert outf.min() >= 0.0 and outf.max() <= 1.0

    def test_uint16_msb_input_matches_float(self):
        # P010-style: 10-bit codes in the MSBs of uint16
        codes10 = RNG.integers(0, 1024, (1, 8, 8, 3))
        u16 = (codes10 << 6).astype(np.uint16)
        f32 = (u16.astype(np.float32) / 65535.0)
        a = np.asarray(tonemap.tonemap_batch(u16))
        b = np.asarray(tonemap.tonemap_batch(f32))
        np.testing.assert_array_equal(a, b)

    def test_hdr_white_maps_to_sdr_white(self):
        # a peak-luminance white pixel must come out 255,255,255
        e = float(np.asarray(tonemap.pq_inv_eotf(np.float32(1000.0))))
        rgb = np.full((1, 4, 4, 3), e, dtype=np.float32)
        out = np.asarray(tonemap.tonemap_batch(
            rgb, transfer="pq", peak_nits=1000.0, target_nits=100.0))
        assert out.min() >= 254  # 1-LSB rounding slack

    def test_uint16_output_scales_to_full_range(self):
        """Integer out_dtypes other than uint8 used to get a bare cast
        of the [0,1] SDR float — essentially black frames of {0,1}. All
        integer outputs must scale to the dtype's code range and agree
        with the uint8 rendering to 1 part in 255."""
        rgb = RNG.uniform(0, 1, (2, 16, 24, 3)).astype(np.float32)
        out8 = np.asarray(tonemap.tonemap_batch(rgb))
        out16 = np.asarray(tonemap.tonemap_batch(rgb, out_dtype=np.uint16))
        assert out16.dtype == np.uint16
        assert out16.max() > 255  # actually using the 16-bit range
        np.testing.assert_allclose(out16 / 65535.0, out8 / 255.0,
                                   atol=1.0 / 255.0)
        # peak white lands on the 16-bit ceiling, not on 1
        e = float(np.asarray(tonemap.pq_inv_eotf(np.float32(1000.0))))
        white = np.full((1, 4, 4, 3), e, dtype=np.float32)
        w16 = np.asarray(tonemap.tonemap_batch(
            white, transfer="pq", peak_nits=1000.0, target_nits=100.0,
            out_dtype=np.uint16))
        assert w16.min() >= 65535 - 257  # 1-LSB-of-uint8 slack

    def test_wide_integer_output_does_not_overflow(self):
        """int32/uint32 maxes are not representable in the f32 compute
        type — float32(2^31-1) rounds UP to 2^31, so a naive scale
        overflowed the cast at peak white (implementation-defined,
        typically wrapping to INT_MIN). The scale must use the largest
        f32 <= max: peak white lands within one f32 ULP of full scale,
        never outside the dtype range."""
        e = float(np.asarray(tonemap.pq_inv_eotf(np.float32(1000.0))))
        white = np.full((1, 4, 4, 3), e, dtype=np.float32)
        for odt in (np.uint32, np.int32):
            w = np.asarray(tonemap.tonemap_batch(
                white, transfer="pq", peak_nits=1000.0,
                target_nits=100.0, out_dtype=odt))
            assert w.dtype == np.dtype(odt)
            info = np.iinfo(odt)
            assert w.min() >= 0, "peak white wrapped negative"
            # full scale up to the f32 roundtrip of the PQ encode
            # (~2e-6 relative) — far above any wraparound artifact
            assert int(w.min()) >= int(info.max * 0.999)
            assert int(w.max()) <= info.max

    def test_black_stays_black(self):
        rgb = np.zeros((1, 4, 4, 3), np.float32)
        out = np.asarray(tonemap.tonemap_batch(rgb))
        assert out.max() == 0

    def test_hue_preserved(self):
        # tone scaling multiplies all channels by one gain: in-gamut
        # pixel channel ratios survive (before the gamut matrix)
        rgb = np.array([[[[0.4, 0.3, 0.2]]]], dtype=np.float32)
        out = np.asarray(tonemap.tonemap_batch(
            rgb, convert_gamut=False, out_dtype=np.float32,
            out_gamma=1.0))
        lin_in = _np_pq_eotf(rgb[0, 0, 0])
        ratio = out[0, 0, 0] / lin_in
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-4)

    def test_hlg_path_runs_and_is_bounded(self):
        rgb = RNG.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
        out = np.asarray(tonemap.tonemap_batch(
            rgb, transfer="hlg", peak_nits=1000.0))
        assert out.dtype == np.uint8
        assert out.max() <= 255

    def test_brighter_hdr_not_darker_sdr(self):
        # grayscale ramp survives tone mapping in order
        e = np.linspace(0.1, 0.75, 16, dtype=np.float32)
        rgb = np.tile(e[None, :, None, None], (1, 1, 4, 3))
        out = np.asarray(tonemap.tonemap_batch(
            rgb, out_dtype=np.float32))[0, :, 0, 0]
        assert np.all(np.diff(out) >= 0)


class TestBt2020Yuv:
    def test_white_and_black_limited_range(self):
        # 10-bit limited range: Y=940 is white, Y=64 is black, chroma 512
        y = np.array([[[940, 64]]], dtype=np.uint16)
        u = np.full_like(y, 512)
        v = np.full_like(y, 512)
        rgb = np.asarray(tonemap.bt2020_yuv_to_rgb(y, u, v, bit_depth=10))
        np.testing.assert_allclose(rgb[0, 0, 0], [1, 1, 1], atol=1e-5)
        np.testing.assert_allclose(rgb[0, 0, 1], [0, 0, 0], atol=1e-5)

    def test_matches_numpy_matrix(self):
        kr, kb = 0.2627, 0.0593
        kg = 1 - kr - kb
        y = RNG.integers(64, 941, (2, 6, 8)).astype(np.uint16)
        u = RNG.integers(64, 961, (2, 6, 8)).astype(np.uint16)
        v = RNG.integers(64, 961, (2, 6, 8)).astype(np.uint16)
        out = np.asarray(tonemap.bt2020_yuv_to_rgb(y, u, v, bit_depth=10))
        yn = (y.astype(np.float64) - 64) / 876
        un = (u.astype(np.float64) - 512) / 896
        vn = (v.astype(np.float64) - 512) / 896
        ref = np.stack([
            yn + 2 * (1 - kr) * vn,
            yn - (2 * kb * (1 - kb) / kg) * un - (2 * kr * (1 - kr) / kg) * vn,
            yn + 2 * (1 - kb) * un,
        ], axis=-1).clip(0, 1)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_full_range_12bit(self):
        y = np.array([[[4095, 0]]], dtype=np.uint16)
        u = np.full_like(y, 2048)
        v = np.full_like(y, 2048)
        rgb = np.asarray(tonemap.bt2020_yuv_to_rgb(
            y, u, v, bit_depth=12, full_range=True))
        np.testing.assert_allclose(rgb[0, 0, 0], [1, 1, 1], atol=1e-3)
        np.testing.assert_allclose(rgb[0, 0, 1], [0, 0, 0], atol=1e-3)

    def test_msb_aligned_p010_layout(self):
        # P010 convention: v16 = v10 << 6. White/black must land exactly
        y = (np.array([[[940, 64]]], dtype=np.uint16) << 6)
        u = np.full_like(y, 512 << 6)
        v = np.full_like(y, 512 << 6)
        rgb = np.asarray(tonemap.bt2020_yuv_to_rgb(
            y, u, v, bit_depth=10, msb_aligned=True))
        np.testing.assert_allclose(rgb[0, 0, 0], [1, 1, 1], atol=1e-5)
        np.testing.assert_allclose(rgb[0, 0, 1], [0, 0, 0], atol=1e-5)

    def test_msb_matches_lsb_values(self):
        y = RNG.integers(64, 941, (1, 4, 6)).astype(np.uint16)
        u = RNG.integers(64, 961, (1, 4, 6)).astype(np.uint16)
        v = RNG.integers(64, 961, (1, 4, 6)).astype(np.uint16)
        lsb = np.asarray(tonemap.bt2020_yuv_to_rgb(y, u, v, bit_depth=10))
        msb = np.asarray(tonemap.bt2020_yuv_to_rgb(
            y << 6, u << 6, v << 6, bit_depth=10, msb_aligned=True))
        np.testing.assert_allclose(msb, lsb, atol=1e-5)

    def test_msb_full_range(self):
        y = (np.array([[[1023, 0]]], dtype=np.uint16) << 6)
        u = np.full_like(y, 512 << 6)
        v = np.full_like(y, 512 << 6)
        rgb = np.asarray(tonemap.bt2020_yuv_to_rgb(
            y, u, v, bit_depth=10, full_range=True, msb_aligned=True))
        np.testing.assert_allclose(rgb[0, 0, 0], [1, 1, 1], atol=2e-3)
        np.testing.assert_allclose(rgb[0, 0, 1], [0, 0, 0], atol=2e-3)
