"""Pallas banded-preprocess kernel tests (interpret mode on CPU).

The real-hardware check runs in bench.py; these validate the weight
construction and kernel math against the XLA fused op via the Pallas
interpreter, which works on the CPU test backend.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
from vali_tpu.ops import fused
from vali_tpu.ops.pallas_fused import (_banded_h_weights,
                                       _chroma_w_weights_interleaved,
                                       pallas_nv12_preprocess,
                                       required_pad_rows)

RNG = np.random.default_rng(5)


def test_banded_weights_rows_sum_to_one():
    from vali_tpu.ops.pallas_fused import TILE

    n_out = 64
    starts, blocks, win, max_end = _banded_h_weights(192, n_out,
                                                     "lanczos_aa")
    assert blocks.shape == ((n_out + TILE - 1) // TILE, TILE, win)
    flat = blocks.reshape(-1, win)[:n_out]
    assert np.allclose(flat.sum(axis=1), 1.0, atol=1e-5)
    from vali_tpu.ops.pallas_fused import ALIGN
    assert (starts % ALIGN == 0).all()


def test_banded_weights_alignment_and_bounds():
    starts, blocks, win, max_end = _banded_h_weights(
        540, 224, "lanczos_aa", row_offset=1080, chroma_of=1080)
    from vali_tpu.ops.pallas_fused import ALIGN
    assert (starts % ALIGN == 0).all()
    # aligned start may sit slightly below the chroma offset
    assert (starts >= 1080 - ALIGN).all()
    assert max_end >= 1080 + 540


def test_chroma_interleaved_w_weights():
    w = _chroma_w_weights_interleaved(64, 16, "lanczos_aa")
    assert w.shape == (64, 32)
    # U columns only touch even rows, V only odd
    assert np.all(w[1::2, :16] == 0.0)
    assert np.all(w[0::2, 16:] == 0.0)
    assert np.allclose(w[:, :16].sum(axis=0), 1.0, atol=1e-5)


def test_required_pad_rows_1080p():
    pad = required_pad_rows(1920, 1080, 224)
    assert 0 <= pad <= 256


@pytest.mark.parametrize("shape", [(2, 96, 256, 32, 64)])
def test_pallas_kernel_interpret_matches_xla(shape):
    B, H, W, DH, DW = shape
    nv12 = jnp.asarray(RNG.integers(0, 256, (B, H * 3 // 2, W),
                                    dtype=np.uint8))
    out = np.asarray(pallas_nv12_preprocess(
        nv12, src_w=W, src_h=H, dst_w=DW, dst_h=DH, interpret=True))
    ref = np.moveaxis(np.asarray(fused.fused_preprocess(
        (nv12,), PixelFormat.NV12, W, H, DW, DH,
        ColorSpace.BT_709, ColorRange.MPEG)), -1, 1)
    # bf16 default compute: a few LSB of interpret-mode bf16 rounding
    # vs the true-f32 XLA fused path
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 4
    assert diff.mean() < 1.0
    # the f32 compute_dtype knob (exactness, ~5x runtime on the MXU —
    # PERFORMANCE.md lesson 10): interpret mode is bit-identical to
    # the f32 XLA fused path
    out_f32 = np.asarray(pallas_nv12_preprocess(
        nv12, src_w=W, src_h=H, dst_w=DW, dst_h=DH, interpret=True,
        compute_dtype=jnp.float32))
    assert np.array_equal(out_f32, ref)


def test_preprocess_batch_pallas_flag_cpu_falls_back():
    from vali_tpu.pipeline.multistream import preprocess_batch

    nv12 = jnp.asarray(RNG.integers(0, 256, (1, 48, 64), dtype=np.uint8))
    out = preprocess_batch((nv12,), PixelFormat.NV12, 64, 32, 16, 16)
    assert out.shape == (1, 16, 16, 3)


def test_pallas_yuv420_kernel_interpret_matches_xla():
    from vali_tpu.ops.pallas_fused import pallas_yuv420_preprocess

    B, H, W, DH, DW = 2, 96, 256, 32, 64
    y = jnp.asarray(RNG.integers(0, 256, (B, H, W), dtype=np.uint8))
    u = jnp.asarray(RNG.integers(0, 256, (B, H // 2, W // 2), np.uint8))
    v = jnp.asarray(RNG.integers(0, 256, (B, H // 2, W // 2), np.uint8))
    out = np.asarray(pallas_yuv420_preprocess(
        y, u, v, src_w=W, src_h=H, dst_w=DW, dst_h=DH, interpret=True))
    ref = np.moveaxis(np.asarray(fused.fused_preprocess(
        (y, u, v), PixelFormat.YUV420, W, H, DW, DH,
        ColorSpace.BT_709, ColorRange.MPEG)), -1, 1)
    # bf16 default compute vs the f32 XLA path (house envelope)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 4 and diff.mean() < 1.0
    # f32 knob: interpret mode is bit-identical to XLA
    out_f32 = np.asarray(pallas_yuv420_preprocess(
        y, u, v, src_w=W, src_h=H, dst_w=DW, dst_h=DH, interpret=True,
        compute_dtype=jnp.float32))
    assert np.array_equal(out_f32, ref)


def test_pallas_p10_kernel_interpret_matches_xla():
    """uint16 MSB-aligned input (P10) computes in f32 in the kernel."""
    B, H, W, DH, DW = 2, 96, 256, 32, 64
    p10 = jnp.asarray(
        (RNG.integers(0, 1024, (B, H * 3 // 2, W)) << 6).astype(np.uint16))
    out = np.asarray(pallas_nv12_preprocess(
        p10, src_w=W, src_h=H, dst_w=DW, dst_h=DH, out_dtype=jnp.float32,
        interpret=True))
    ref = np.moveaxis(np.asarray(fused.fused_preprocess(
        (p10,), PixelFormat.P10, W, H, DW, DH,
        ColorSpace.BT_709, ColorRange.MPEG, out_dtype=jnp.float32)), -1, 1)
    # both normalized to ~[0,1]; compare absolutely
    assert np.abs(out - ref).max() < 2e-3


@pytest.mark.parametrize("geom", [
    (62, 130, 30, 34),     # odd-ish dims, upscale H
    (480, 640, 224, 224),  # 480p -> 224
    (64, 64, 64, 64),      # identity
    (720, 1280, 90, 160),  # 8x downscale
    (36, 100, 100, 36),    # upscale one axis, downscale other
])
def test_pallas_geometry_sweep(geom):
    """Random-ish geometries: banded windows, alignment and padding must
    hold for any (even-dim) shape, matching the XLA path."""
    H, W, DH, DW = geom
    nv12 = jnp.asarray(RNG.integers(0, 256, (1, H * 3 // 2, W),
                                    dtype=np.uint8))
    out = np.asarray(pallas_nv12_preprocess(
        nv12, src_w=W, src_h=H, dst_w=DW, dst_h=DH, interpret=True))
    ref = np.moveaxis(np.asarray(fused.fused_preprocess(
        (nv12,), PixelFormat.NV12, W, H, DW, DH,
        ColorSpace.BT_709, ColorRange.MPEG)), -1, 1)
    diff = np.abs(out.astype(int) - ref.astype(int))
    assert diff.max() <= 4, (geom, diff.max())
    assert diff.mean() < 1.0, (geom, diff.mean())
    # f32 knob: within one rounding tie of the dense XLA path at every
    # geometry (banded-vs-dense accumulation order)
    out_f32 = np.asarray(pallas_nv12_preprocess(
        nv12, src_w=W, src_h=H, dst_w=DW, dst_h=DH, interpret=True,
        compute_dtype=jnp.float32))
    diff = np.abs(out_f32.astype(int) - ref.astype(int))
    assert diff.max() <= 1, (geom, diff.max())
    assert (diff > 0).mean() < 1e-3, (geom, (diff > 0).mean())


def test_pallas_normalize_fold():
    """Model input normalization folds into the kernel tail (float out)."""
    nv12 = jnp.asarray(RNG.integers(0, 256, (1, 96, 128), dtype=np.uint8))
    norm = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    out = np.asarray(pallas_nv12_preprocess(
        nv12, src_w=128, src_h=64, dst_w=32, dst_h=32,
        out_dtype=jnp.float32, normalize=norm, interpret=True))
    ref = np.moveaxis(np.asarray(fused.fused_preprocess(
        (nv12,), PixelFormat.NV12, 128, 64, 32, 32,
        ColorSpace.BT_709, ColorRange.MPEG, out_dtype=jnp.float32,
        normalize=norm)), -1, 1)
    # interpret-mode bf16 rounding amplified by 1/std; hardware is tighter
    assert np.abs(out - ref).max() < 0.08
    # f32 knob matches the XLA path to f32 rounding even through 1/std
    out_f32 = np.asarray(pallas_nv12_preprocess(
        nv12, src_w=128, src_h=64, dst_w=32, dst_h=32,
        out_dtype=jnp.float32, normalize=norm, interpret=True,
        compute_dtype=jnp.float32))
    assert np.abs(out_f32 - ref).max() < 1e-5
    with pytest.raises(ValueError):
        pallas_nv12_preprocess(nv12, src_w=128, src_h=64, dst_w=32,
                               dst_h=32, normalize=norm, interpret=True)


class TestPallasResize:
    """Banded NV12->NV12 resize kernel (pallas_nv12_resize)."""

    def _psnr(self, a, b):
        mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
        return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)

    @pytest.mark.parametrize("dims", [(96, 256, 48, 128),
                                      (108, 384, 48, 192),
                                      (64, 128, 96, 256)])  # incl. upscale
    def test_matches_xla_resize(self, dims):
        from vali_tpu.ops.pallas_fused import (pallas_nv12_resize,
                                               required_pad_rows_resize)
        from vali_tpu.ops.resize import resize_batch

        H, W, DH, DW = dims
        rng = np.random.default_rng(0)
        pad = required_pad_rows_resize(W, H, DW, DH)
        nv12 = np.zeros((2, H * 3 // 2 + pad, W), np.uint8)
        nv12[:, :H * 3 // 2] = rng.integers(0, 256, (2, H * 3 // 2, W),
                                            dtype=np.uint8)
        got = np.asarray(pallas_nv12_resize(
            jnp.asarray(nv12), src_w=W, src_h=H, dst_w=DW, dst_h=DH,
            interpret=True))
        want = np.asarray(resize_batch(
            (jnp.asarray(nv12[:, :H * 3 // 2]),), PixelFormat.NV12,
            W, H, DW, DH, method="lanczos_aa")[0])
        assert got.shape == want.shape
        # bf16 compute vs the XLA f32 path: tiny rounding differences
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 3
        assert self._psnr(got, want) > 48.0
        # compute_dtype=f32 is the exactness knob on this MXU-MAC-bound
        # kernel (its uint8 default stays bf16 — f32_ab_lab.py: 1.86x
        # slower at 4K): <=1-LSB accumulation ties vs the XLA f32 path
        got_f32 = np.asarray(pallas_nv12_resize(
            jnp.asarray(nv12), src_w=W, src_h=H, dst_w=DW, dst_h=DH,
            interpret=True, compute_dtype=jnp.float32))
        assert np.abs(got_f32.astype(int) - want.astype(int)).max() <= 1

    def test_bf16_compute_rejected_for_uint16(self):
        from vali_tpu.ops.pallas_fused import (pallas_nv12_resize,
                                               pallas_packed_resize,
                                               pallas_plane_resize)

        u16 = jnp.zeros((1, 96, 128), jnp.uint16)
        with pytest.raises(ValueError, match="float32"):
            pallas_nv12_resize(u16, src_w=128, src_h=64, dst_w=64,
                               dst_h=32, interpret=True,
                               compute_dtype=jnp.bfloat16)
        with pytest.raises(ValueError, match="float32"):
            pallas_plane_resize(u16, src_h=96, dst_h=48, dst_w=64,
                                interpret=True,
                                compute_dtype=jnp.bfloat16)
        with pytest.raises(ValueError, match="float32"):
            pallas_packed_resize(
                jnp.zeros((1, 96, 128 * 3), jnp.float32), src_w=128,
                src_h=96, dst_w=64, dst_h=48, interpret=True,
                compute_dtype=jnp.bfloat16)

    def test_p10_high_bit_depth(self):
        from vali_tpu.ops.pallas_fused import (pallas_nv12_resize,
                                               required_pad_rows_resize)
        from vali_tpu.ops.resize import resize_batch

        H, W, DH, DW = 96, 256, 48, 128
        rng = np.random.default_rng(1)
        pad = required_pad_rows_resize(W, H, DW, DH)
        p10 = np.zeros((2, H * 3 // 2 + pad, W), np.uint16)
        p10[:, :H * 3 // 2] = (rng.integers(
            0, 1024, (2, H * 3 // 2, W), dtype=np.uint16) << 6)
        got = np.asarray(pallas_nv12_resize(
            jnp.asarray(p10), src_w=W, src_h=H, dst_w=DW, dst_h=DH,
            interpret=True))
        want = np.asarray(resize_batch(
            (jnp.asarray(p10[:, :H * 3 // 2]),), PixelFormat.P10,
            W, H, DW, DH, method="lanczos_aa")[0])
        assert got.dtype == np.uint16
        # f32 compute path: matches the XLA f32 einsum to the last ulp
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    @pytest.mark.parametrize("dtype,tol", [("uint8", 3), ("uint16", 1)])
    def test_plane_resize_matches_resize_plane(self, dtype, tol):
        from vali_tpu.ops.pallas_fused import pallas_plane_resize
        from vali_tpu.ops.resize import resize_plane

        H, W, DH, DW = 96, 256, 40, 120
        rng = np.random.default_rng(0)
        dt = np.dtype(dtype)
        x = rng.integers(0, np.iinfo(dt).max, (2, H, W), dtype=dt)
        got = np.asarray(pallas_plane_resize(
            jnp.asarray(x), src_h=H, dst_h=DH, dst_w=DW, interpret=True))
        want = np.asarray(resize_plane(jnp.asarray(x), DH, DW,
                                       "lanczos_aa"))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= tol

    def test_plane_resize_float32(self):
        from vali_tpu.ops.pallas_fused import pallas_plane_resize
        from vali_tpu.ops.resize import resize_plane

        H, W, DH, DW = 64, 128, 96, 200  # upscale, float path
        rng = np.random.default_rng(2)
        x = (rng.standard_normal((2, H, W)) * 100).astype(np.float32)
        got = np.asarray(pallas_plane_resize(
            jnp.asarray(x), src_h=H, dst_h=DH, dst_w=DW, interpret=True))
        want = np.asarray(resize_plane(jnp.asarray(x), DH, DW,
                                       "lanczos_aa"))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    def test_non_lane_multiple_source_width(self):
        """848-wide sources (the repo's canonical clip geometry) exercise
        the interleaved-chroma dense fallback + aligned start clamp —
        used to crash with a contracting-dimension mismatch."""
        from vali_tpu.ops.pallas_fused import (pallas_nv12_resize,
                                               required_pad_rows_resize)
        from vali_tpu.ops.resize import resize_batch

        H, W, DH, DW = 464, 848, 64, 128
        rng = np.random.default_rng(5)
        pad = required_pad_rows_resize(W, H, DW, DH)
        nv12 = np.zeros((2, H * 3 // 2 + pad, W), np.uint8)
        nv12[:, :H * 3 // 2] = rng.integers(0, 256, (2, H * 3 // 2, W),
                                            dtype=np.uint8)
        got = np.asarray(pallas_nv12_resize(
            jnp.asarray(nv12), src_w=W, src_h=H, dst_w=DW, dst_h=DH,
            interpret=True))
        want = np.asarray(resize_batch(
            (jnp.asarray(nv12[:, :H * 3 // 2]),), PixelFormat.NV12,
            W, H, DW, DH, method="lanczos_aa")[0])
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 3


def test_bf16_normalized_output():
    """Model-feed configuration: bf16 output with folded normalization
    (half the output bytes of f32, MXU-native for the consumer)."""
    from vali_tpu.ops.pallas_fused import (pallas_nv12_preprocess,
                                           required_pad_rows)

    H, W, DH, DW = 96, 256, 32, 64
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    nv = np.zeros((2, H * 3 // 2 + pad, W), np.uint8)
    nv[:, :H * 3 // 2] = rng.integers(0, 256, (2, H * 3 // 2, W),
                                      dtype=np.uint8)
    norm = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    out = pallas_nv12_preprocess(
        jnp.asarray(nv), src_w=W, src_h=H, dst_w=DW, dst_h=DH,
        out_dtype=jnp.bfloat16, normalize=norm, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = pallas_nv12_preprocess(
        jnp.asarray(nv), src_w=W, src_h=H, dst_w=DW, dst_h=DH,
        out_dtype=jnp.float32, normalize=norm, interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=0.02, atol=0.02)


# ---------------------------------------------------------------------------
# Round-3 kernels: packed-RGB conversion + packed resize (config-2 path)
# ---------------------------------------------------------------------------

class TestPackedConvert:
    @pytest.mark.parametrize("wh", [(256, 96), (168, 64)],
                             ids=["group128", "generic"])
    def test_nv12_to_rgb_interpret_matches_xla(self, wh):
        from vali_tpu.core.details import ColorspaceConversionContext
        from vali_tpu.ops import csc
        from vali_tpu.ops.pallas_fused import pallas_nv12_to_rgb

        W, H = wh
        nv12 = jnp.asarray(RNG.integers(0, 256, (2, H * 3 // 2, W),
                                        dtype=np.uint8))
        cc = ColorspaceConversionContext(ColorSpace.BT_709,
                                         ColorRange.MPEG)
        want = np.asarray(csc.convert_batch(
            (nv12,), PixelFormat.NV12, PixelFormat.RGB, W, H, cc,
            use_pallas=False)[0])
        got = np.asarray(pallas_nv12_to_rgb(
            nv12, src_w=W, src_h=H, space=ColorSpace.BT_709,
            crange=ColorRange.MPEG, interpret=True))
        assert got.shape == want.shape
        # bf16 default compute: coefficient-rounding envelope
        diff = np.abs(got.astype(int) - want.astype(int))
        assert diff.max() <= 2
        assert (diff > 1).mean() < 0.01
        # the f32 knob matches the exact XLA route to <=1-LSB
        # banded-vs-dense accumulation ties (exactness costs MXU
        # passes — PERFORMANCE.md lesson 10)
        got_f32 = np.asarray(pallas_nv12_to_rgb(
            nv12, src_w=W, src_h=H, space=ColorSpace.BT_709,
            crange=ColorRange.MPEG, interpret=True,
            compute_dtype=jnp.float32))
        diff = np.abs(got_f32.astype(int) - want.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3

    def test_nv12_to_bgr_swap(self):
        from vali_tpu.core.details import ColorspaceConversionContext
        from vali_tpu.ops import csc
        from vali_tpu.ops.pallas_fused import pallas_nv12_to_rgb

        W, H = 128, 32
        nv12 = jnp.asarray(RNG.integers(0, 256, (1, H * 3 // 2, W),
                                        dtype=np.uint8))
        cc = ColorspaceConversionContext(ColorSpace.BT_601,
                                         ColorRange.JPEG)
        want = np.asarray(csc.convert_batch(
            (nv12,), PixelFormat.NV12, PixelFormat.BGR, W, H, cc,
            use_pallas=False)[0])
        got = np.asarray(pallas_nv12_to_rgb(
            nv12, src_w=W, src_h=H, space=ColorSpace.BT_601,
            crange=ColorRange.JPEG, swap=True, interpret=True))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 2

    def test_convert_batch_cpu_stays_xla(self):
        """On the CPU backend the auto route keeps the exact XLA path."""
        from vali_tpu.ops import csc

        assert not csc._pallas_convert_usable()


class TestPackedResize:
    @pytest.mark.parametrize("dtype,tol", [(np.uint8, 1),
                                           (np.float32, 1e-5)])
    def test_matches_xla_einsum(self, dtype, tol):
        from vali_tpu.ops import resize
        from vali_tpu.ops.pallas_fused import pallas_packed_resize

        B, H, W, DH, DW = 2, 96, 256, 40, 64
        if dtype == np.uint8:
            rgb = jnp.asarray(RNG.integers(0, 256, (B, H, W * 3),
                                           dtype=np.uint8))
            fmt = PixelFormat.RGB
        else:
            rgb = jnp.asarray(
                RNG.random((B, H, W * 3)).astype(np.float32))
            fmt = PixelFormat.RGB_32F
        want = np.asarray(resize.resize_batch(
            (rgb,), fmt, W, H, DW, DH, method="lanczos_aa",
            use_pallas=False)[0])
        got = np.asarray(pallas_packed_resize(
            rgb, src_w=W, src_h=H, dst_w=DW, dst_h=DH,
            method="lanczos_aa", interpret=True))
        assert got.shape == want.shape
        if dtype == np.uint8:
            # bf16 default compute: historical envelope
            assert np.abs(got.astype(int) - want.astype(int)).max() <= 4
            # the f32 knob: <=1-LSB accumulation ties only
            got_f32 = np.asarray(pallas_packed_resize(
                rgb, src_w=W, src_h=H, dst_w=DW, dst_h=DH,
                method="lanczos_aa", interpret=True,
                compute_dtype=jnp.float32))
            assert np.abs(got_f32.astype(int)
                          - want.astype(int)).max() <= 1
        else:
            # float input always computes f32
            assert np.abs(got - want).max() < tol

    def test_upscale_and_npp_method(self):
        from vali_tpu.ops import resize
        from vali_tpu.ops.pallas_fused import pallas_packed_resize

        B, H, W, DH, DW = 1, 48, 128, 96, 256
        rgb = jnp.asarray(RNG.integers(0, 256, (B, H, W * 3),
                                       dtype=np.uint8))
        want = np.asarray(resize.resize_batch(
            (rgb,), PixelFormat.RGB, W, H, DW, DH, method="lanczos",
            use_pallas=False)[0])
        got = np.asarray(pallas_packed_resize(
            rgb, src_w=W, src_h=H, dst_w=DW, dst_h=DH, method="lanczos",
            interpret=True))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 4

    def test_resize_batch_cpu_stays_xla(self):
        from vali_tpu.ops import resize

        assert not resize._pallas_resize_usable()


class TestClampOverPad:
    """Clamp-over-pad must actually engage for 1080p storage.

    1620 rows (H*3/2) is NOT a multiple of the h_align=8 window
    alignment; an aligned-only clamp cannot reach the last 4 rows, and
    every 1080p kernel silently fell back to a per-call device-side
    jnp.pad of the whole batch (~0.7 ms/64-frame batch, found in review)
    until the final clamped window was allowed to start unaligned at
    extent-win. These pin (a) the builder reporting no padding needed,
    (b) bit-identity of the unpadded vs padded kernel outputs.
    """

    def test_row_blocks_fit_1080p_needs_no_pad(self):
        from vali_tpu.ops.pallas_fused import _row_blocks_fit
        from vali_tpu.ops.resize import resize_weights

        H, rows_have = 1080, 1620
        # chroma replication (convert path)
        R = np.zeros((H, H // 2), dtype=np.float32)
        R[np.arange(H), np.arange(H) // 2] = 1.0
        for dense, off in ((R, H),
                           (resize_weights(H // 2, 112, "lanczos_aa"), H),
                           (resize_weights(H // 2, 270, "lanczos_aa"), H),
                           (resize_weights(H, 224, "lanczos_aa"), 0)):
            starts, blocks, win, req = _row_blocks_fit(
                dense, 32, 8, rows_have, row_offset=off)
            assert req == rows_have, (req, rows_have)
            assert int(starts.max()) + win <= rows_have

    def test_unpadded_matches_padded_1080p(self):
        from vali_tpu.ops.pallas_fused import (pallas_nv12_preprocess,
                                               pallas_nv12_to_rgb,
                                               required_pad_rows)

        B, H, W = 1, 1080, 256
        base = RNG.integers(0, 256, (B, H * 3 // 2, W), dtype=np.uint8)
        x = jnp.asarray(base)
        pr = max(required_pad_rows(W, H, 224), 8)
        xp = jnp.asarray(np.concatenate(
            [base, np.zeros((B, pr, W), np.uint8)], axis=1))
        a = np.asarray(pallas_nv12_to_rgb(x, src_w=W, src_h=H,
                                          interpret=True))
        b = np.asarray(pallas_nv12_to_rgb(xp, src_w=W, src_h=H,
                                          interpret=True))
        assert np.array_equal(a, b)
        c = np.asarray(pallas_nv12_preprocess(
            x, src_w=W, src_h=H, dst_w=224, dst_h=224, interpret=True))
        d = np.asarray(pallas_nv12_preprocess(
            xp, src_w=W, src_h=H, dst_w=224, dst_h=224, interpret=True))
        assert np.array_equal(c, d)


def test_undersized_plane_raises_value_error():
    """An input plane smaller than the declared source size must fail
    loudly with ValueError (not a bare assert, which python -O strips
    into silent band-tail truncation — advisor round 3)."""
    from vali_tpu.ops.pallas_fused import (pallas_packed_resize,
                                           pallas_plane_resize)

    short = jnp.asarray(RNG.integers(0, 256, (1, 100, 256), dtype=np.uint8))
    with pytest.raises(ValueError, match="rows < src_h"):
        pallas_plane_resize(short, src_h=256, dst_h=64, dst_w=64,
                            interpret=True)
    packed = jnp.asarray(
        RNG.integers(0, 256, (1, 100, 128 * 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="rows < src_h"):
        pallas_packed_resize(packed, src_w=128, src_h=256, dst_w=64,
                             dst_h=64, interpret=True)


def test_wrappers_expose_use_pallas():
    """PySurfaceConverter/PySurfaceResizer accept use_pallas=False for
    the bit-exact XLA route (advisor round 3: the TPU default routes
    packed formats through the ~1-LSB Pallas kernels; the opt-out must
    be reachable from the wrapper layer). On the CPU backend both
    routes are the XLA path, so outputs match exactly."""
    import vali_tpu as vali

    W, H = 128, 64
    nv12 = RNG.integers(0, 256, (H * 3 // 2, W), dtype=np.uint8)
    src = vali.Surface.from_numpy(nv12.reshape(-1), vali.PixelFormat.NV12,
                                  width=W, height=H)
    outs = []
    for up in (None, False):
        dst = vali.Surface.Make(vali.PixelFormat.RGB, W, H)
        conv = vali.PySurfaceConverter(gpu_id=0, use_pallas=up)
        ok, info = conv.Run(src, dst)
        assert ok, info
        outs.append(dst.to_numpy().copy())
    assert np.array_equal(outs[0], outs[1])

    routs = []
    rgb_src = vali.Surface.from_numpy(outs[0].reshape(-1),
                                      vali.PixelFormat.RGB,
                                      width=W, height=H)
    for up in (None, False):
        dst = vali.Surface.Make(vali.PixelFormat.RGB, 48, 32)
        rsz = vali.PySurfaceResizer(vali.PixelFormat.RGB, gpu_id=0,
                                    use_pallas=up)
        ok, info = rsz.Run(rgb_src, dst)
        assert ok, info
        routs.append(dst.to_numpy().copy())
    assert np.array_equal(routs[0], routs[1])
