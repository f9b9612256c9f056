"""Pallas kernel family on REAL TPU hardware (compiled Mosaic, not
interpret mode): NV12/YUV420/YUV444 at standard and arbitrary dst sizes
must match their interpret-mode outputs bit-exactly — interpret mode is
what tests/ validates against the XLA reference, so equality here closes
the chain compiled-Mosaic == interpret == XLA."""

import numpy as np
import pytest

import jax.numpy as jnp

from vali_tpu.core.enums import ColorRange, ColorSpace
from vali_tpu.ops.pallas_fused import (pallas_nv12_preprocess,
                                       pallas_yuv420_preprocess,
                                       pallas_yuv422_preprocess,
                                       pallas_yuv444_preprocess,
                                       required_pad_rows,
                                       required_pad_rows_yuv420,
                                       required_pad_rows_yuv422,
                                       required_pad_rows_yuv444)

RNG = np.random.default_rng(7)


@pytest.mark.parametrize("dh,dw", [(224, 224), (60, 100), (17, 39)])
def test_nv12_real_vs_interpret(dh, dw):
    B, H, W = 2, 96, 256
    pad = required_pad_rows(W, H, dh)
    nv12 = jnp.asarray(RNG.integers(0, 256, (B, H * 3 // 2 + pad, W),
                                    dtype=np.uint8))
    kw = dict(src_w=W, src_h=H, dst_w=dw, dst_h=dh,
              space=ColorSpace.BT_709, crange=ColorRange.MPEG)
    got = np.asarray(pallas_nv12_preprocess(nv12, **kw))
    want = np.asarray(pallas_nv12_preprocess(nv12, interpret=True, **kw))
    assert np.array_equal(got, want)


def test_nv12_f32_knob_real_vs_interpret():
    """compute_dtype=float32 (the exactness knob — NOT the default;
    ~5x MXU cost, PERFORMANCE.md lesson 10): compiled Mosaic ==
    interpret, i.e. precision=HIGHEST is bit-deterministic on chip."""
    B, H, W, DH, DW = 2, 96, 256, 32, 64
    pad = required_pad_rows(W, H, DH)
    nv12 = jnp.asarray(RNG.integers(0, 256, (B, H * 3 // 2 + pad, W),
                                    dtype=np.uint8))
    kw = dict(src_w=W, src_h=H, dst_w=DW, dst_h=DH,
              compute_dtype=jnp.float32)
    got = np.asarray(pallas_nv12_preprocess(nv12, **kw))
    want = np.asarray(pallas_nv12_preprocess(nv12, interpret=True, **kw))
    assert np.array_equal(got, want)


def test_p10_real_vs_interpret():
    """High bit depth (MSB-aligned uint16, NVDEC P010 layout): the f32
    compute path of the NV12 kernel."""
    B, H, W, DH, DW = 2, 96, 256, 32, 64
    pad = required_pad_rows(W, H, DH)
    p10 = jnp.asarray(
        (RNG.integers(0, 1024, (B, H * 3 // 2 + pad, W)) << 6).astype(
            np.uint16))
    kw = dict(src_w=W, src_h=H, dst_w=DW, dst_h=DH)
    got = np.asarray(pallas_nv12_preprocess(p10, **kw))
    want = np.asarray(pallas_nv12_preprocess(p10, interpret=True, **kw))
    assert np.array_equal(got, want)


def test_yuv420_real_vs_interpret():
    B, H, W, DH, DW = 2, 96, 256, 32, 64
    ypad, cpad = required_pad_rows_yuv420(W, H, DH)
    y = jnp.asarray(RNG.integers(0, 256, (B, H + ypad, W), np.uint8))
    u = jnp.asarray(RNG.integers(0, 256, (B, H // 2 + cpad, W // 2),
                                 np.uint8))
    v = jnp.asarray(RNG.integers(0, 256, (B, H // 2 + cpad, W // 2),
                                 np.uint8))
    kw = dict(src_w=W, src_h=H, dst_w=DW, dst_h=DH)
    got = np.asarray(pallas_yuv420_preprocess(y, u, v, **kw))
    want = np.asarray(pallas_yuv420_preprocess(y, u, v, interpret=True,
                                               **kw))
    assert np.array_equal(got, want)


def test_yuv420_10bit_real_vs_interpret():
    B, H, W, DH, DW = 2, 96, 256, 32, 64
    ypad, cpad = required_pad_rows_yuv420(W, H, DH)
    y = jnp.asarray(RNG.integers(0, 1024, (B, H + ypad, W)).astype(
        np.uint16))
    u = jnp.asarray(RNG.integers(0, 1024, (B, H // 2 + cpad, W // 2))
                    .astype(np.uint16))
    v = jnp.asarray(RNG.integers(0, 1024, (B, H // 2 + cpad, W // 2))
                    .astype(np.uint16))
    kw = dict(src_w=W, src_h=H, dst_w=DW, dst_h=DH, bit_depth=10)
    got = np.asarray(pallas_yuv420_preprocess(y, u, v, **kw))
    want = np.asarray(pallas_yuv420_preprocess(y, u, v, interpret=True,
                                               **kw))
    assert np.array_equal(got, want)


def test_yuv422_real_vs_interpret():
    B, H, W, DH, DW = 2, 96, 256, 32, 64
    pad = required_pad_rows_yuv422(W, H, DH)
    y = jnp.asarray(RNG.integers(0, 256, (B, H + pad, W), np.uint8))
    u = jnp.asarray(RNG.integers(0, 256, (B, H + pad, W // 2), np.uint8))
    v = jnp.asarray(RNG.integers(0, 256, (B, H + pad, W // 2), np.uint8))
    kw = dict(src_w=W, src_h=H, dst_w=DW, dst_h=DH)
    got = np.asarray(pallas_yuv422_preprocess(y, u, v, **kw))
    want = np.asarray(pallas_yuv422_preprocess(y, u, v, interpret=True,
                                               **kw))
    assert np.array_equal(got, want)


def test_yuv444_real_vs_interpret():
    B, H, W, DH, DW = 2, 96, 256, 32, 64
    pad = required_pad_rows_yuv444(W, H, DH)
    planes = tuple(jnp.asarray(RNG.integers(0, 256, (B, H + pad, W),
                                            np.uint8)) for _ in range(3))
    kw = dict(src_w=W, src_h=H, dst_w=DW, dst_h=DH)
    got = np.asarray(pallas_yuv444_preprocess(*planes, **kw))
    want = np.asarray(pallas_yuv444_preprocess(*planes, interpret=True,
                                               **kw))
    assert np.array_equal(got, want)


def test_csc_layout_path_real_tpu():
    """The channel-plane CSC layout (staged chroma + one packed relayout)
    must be byte-identical on the real chip to the same math on host
    numpy (NV12 -> RGB, BT709/MPEG)."""
    from vali_tpu.core.details import ColorspaceConversionContext
    from vali_tpu.core.enums import PixelFormat
    from vali_tpu.ops import colors, csc

    B, H, W = 2, 96, 256
    nv12 = RNG.integers(0, 256, (B, H * 3 // 2, W), dtype=np.uint8)
    cc = ColorspaceConversionContext(ColorSpace.BT_709, ColorRange.MPEG)
    # use_pallas=False: this test pins the exact XLA channel-plane
    # layout path; the TPU auto route (bf16 Pallas) has its own test
    # below (test_nv12_to_rgb_packed_real_vs_xla).
    got = np.asarray(csc.convert_batch(
        (jnp.asarray(nv12),), PixelFormat.NV12, PixelFormat.RGB,
        W, H, cc, use_pallas=False)[0])

    # host reference: same nearest-upsample + matrix math in numpy f64->f32
    y = nv12[:, :H, :].astype(np.float32)
    uv = nv12[:, H:, :]
    u = uv[:, :, 0::2].repeat(2, axis=1).repeat(2, axis=2).astype(np.float32)
    v = uv[:, :, 1::2].repeat(2, axis=1).repeat(2, axis=2).astype(np.float32)
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    yf, uf, vf = y - np.float32(y_off), u - 128.0, v - 128.0
    want = np.stack([m[i, 0] * yf + m[i, 1] * uf + m[i, 2] * vf
                     for i in range(3)], axis=-1)
    want = np.clip(np.round(want), 0, 255).astype(np.uint8)
    want = want.reshape(B, H, W * 3)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1  # f32 rounding at .5 boundaries
    assert (diff > 0).mean() < 1e-3


def test_nv12_resize_real_vs_interpret():
    """Banded NV12 resize: compiled Mosaic == interpret (which tests/
    ties to the XLA reference)."""
    from vali_tpu.ops.pallas_fused import (pallas_nv12_resize,
                                           required_pad_rows_resize)

    H, W, DH, DW = 96, 256, 48, 128
    pad = required_pad_rows_resize(W, H, DW, DH)
    nv12 = np.zeros((2, H * 3 // 2 + pad, W), np.uint8)
    nv12[:, :H * 3 // 2] = RNG.integers(0, 256, (2, H * 3 // 2, W),
                                        dtype=np.uint8)
    x = jnp.asarray(nv12)
    kw = dict(src_w=W, src_h=H, dst_w=DW, dst_h=DH)
    got = np.asarray(pallas_nv12_resize(x, **kw))
    want = np.asarray(pallas_nv12_resize(x, interpret=True, **kw))
    assert np.array_equal(got, want)


def test_plane_resize_real_vs_interpret():
    from vali_tpu.ops.pallas_fused import pallas_plane_resize

    H, W, DH, DW = 96, 256, 40, 120
    x = jnp.asarray(RNG.integers(0, 256, (2, H, W), dtype=np.uint8))
    kw = dict(src_h=H, dst_h=DH, dst_w=DW)
    got = np.asarray(pallas_plane_resize(x, **kw))
    want = np.asarray(pallas_plane_resize(x, interpret=True, **kw))
    assert np.array_equal(got, want)


def test_plane_resize_u16_real_vs_interpret():
    """High-bit-depth (f32 compute) plane resize on the real chip."""
    from vali_tpu.ops.pallas_fused import pallas_plane_resize

    H, W, DH, DW = 96, 256, 40, 120
    x = jnp.asarray(RNG.integers(0, 4096, (2, H, W), dtype=np.uint16))
    kw = dict(src_h=H, dst_h=DH, dst_w=DW)
    got = np.asarray(pallas_plane_resize(x, **kw))
    want = np.asarray(pallas_plane_resize(x, interpret=True, **kw))
    assert np.array_equal(got, want)


def test_preprocess_batch_routes_to_pallas_on_tpu(monkeypatch):
    """The pipeline's one-shot entry must route NV12 to the banded
    kernel on TPU, and that kernel must sit inside its documented
    bf16-compute envelope vs the true-f32 XLA fused path.

    Routing is proven by instrumentation: preprocess_batch imports
    pallas_preprocess from ops.pallas_fused at call time, so a
    recording wrapper observes the dispatch directly — robust to
    whatever compute dtype the kernel defaults to (bit-identity with
    the directly-called kernel additionally pins the default path).
    The envelope is the bf16 one: |d|<=3, ~6% of pixels beyond 1 LSB,
    PSNR ~49 dB on random NV12 (both paths platform-deterministic)."""
    from vali_tpu.core.enums import PixelFormat
    from vali_tpu.ops import pallas_fused
    from vali_tpu.ops.fused import LANCZOS_AA, fused_preprocess
    from vali_tpu.ops.pallas_fused import (pallas_nv12_preprocess,
                                           required_pad_rows)
    from vali_tpu.pipeline.multistream import _pallas_usable, preprocess_batch

    assert _pallas_usable(PixelFormat.NV12, ColorSpace.BT_709,
                          ColorRange.MPEG)
    B, H, W, DH, DW = 2, 96, 256, 32, 64
    pad = required_pad_rows(W, H, DH)
    nv = np.zeros((B, H * 3 // 2 + pad, W), np.uint8)
    nv[:, :H * 3 // 2] = RNG.integers(0, 256, (B, H * 3 // 2, W),
                                      dtype=np.uint8)
    x = jnp.asarray(nv)
    calls = []
    real = pallas_fused.pallas_preprocess
    monkeypatch.setattr(pallas_fused, "pallas_preprocess",
                        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1])
    got = np.asarray(preprocess_batch((x,), PixelFormat.NV12, W, H, DW, DH,
                                      planar=True))
    assert calls, "pipeline did not take the Pallas route"
    direct = np.asarray(pallas_nv12_preprocess(
        x, src_w=W, src_h=H, dst_w=DW, dst_h=DH, space=ColorSpace.BT_709,
        crange=ColorRange.MPEG, out_dtype=jnp.uint8, method=LANCZOS_AA,
        normalize=None))
    assert np.array_equal(got, direct)
    want = np.asarray(fused_preprocess((x[:, :H * 3 // 2],),
                                       PixelFormat.NV12, W, H, DW, DH,
                                       planar=True))
    d = np.abs(got.astype(np.int32) - want.astype(np.int32))
    mse = float((d.astype(np.float64) ** 2).mean())
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert d.max() <= 4, int(d.max())
    assert (d > 1).mean() < 0.15, float((d > 1).mean())
    assert psnr > 46.0, psnr


def test_nv12_to_rgb_packed_real_vs_xla():
    """Round-3 packed-convert kernel on the real chip: within 1 LSB of
    the f32 XLA channel-plane path (bf16 coefficient rounding)."""
    from vali_tpu.core.details import ColorspaceConversionContext
    from vali_tpu.ops import csc
    from vali_tpu.core.enums import PixelFormat
    from vali_tpu.ops.pallas_fused import pallas_nv12_to_rgb

    B, H, W = 2, 96, 256
    nv12 = jnp.asarray(RNG.integers(0, 256, (B, H * 3 // 2, W),
                                    dtype=np.uint8))
    cc = ColorspaceConversionContext(ColorSpace.BT_709, ColorRange.MPEG)
    want = np.asarray(csc.convert_batch(
        (nv12,), PixelFormat.NV12, PixelFormat.RGB, W, H, cc,
        use_pallas=False)[0])
    got = np.asarray(pallas_nv12_to_rgb(
        nv12, src_w=W, src_h=H, space=ColorSpace.BT_709,
        crange=ColorRange.MPEG))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # the auto route (what convert_batch does on TPU) picks this kernel
    auto = np.asarray(csc.convert_batch(
        (nv12,), PixelFormat.NV12, PixelFormat.RGB, W, H, cc)[0])
    assert np.array_equal(auto, got)


def test_packed_resize_real_vs_xla():
    """Round-3 packed-resize kernel on the real chip."""
    from vali_tpu.core.enums import PixelFormat
    from vali_tpu.ops import resize
    from vali_tpu.ops.pallas_fused import pallas_packed_resize

    B, H, W, DH, DW = 2, 96, 256, 40, 64
    rgb = jnp.asarray(RNG.integers(0, 256, (B, H, W * 3),
                                   dtype=np.uint8))
    want = np.asarray(resize.resize_batch(
        (rgb,), PixelFormat.RGB, W, H, DW, DH, method="lanczos_aa",
        use_pallas=False)[0])
    got = np.asarray(pallas_packed_resize(
        rgb, src_w=W, src_h=H, dst_w=DW, dst_h=DH, method="lanczos_aa"))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    auto = np.asarray(resize.resize_batch(
        (rgb,), PixelFormat.RGB, W, H, DW, DH, method="lanczos_aa")[0])
    assert np.array_equal(auto, got)


def test_unaligned_final_clamp_window_real_tpu():
    """Unaligned final clamp windows must compile on real Mosaic.

    H=270 gives 405 storage rows (405 % 8 = 5): the chroma replication
    and resize bands end in the last extent%align rows, so the final
    clamped window starts UNALIGNED at extent-win — the case that used
    to silently fall back to a per-call device jnp.pad (and the case
    interpret mode cannot prove Mosaic accepts). Checks both the packed
    convert and the fused preprocess against padded-input runs
    (bit-identical) and the XLA path (1 LSB)."""
    from vali_tpu.core.details import ColorspaceConversionContext
    from vali_tpu.core.enums import PixelFormat
    from vali_tpu.ops import csc
    from vali_tpu.ops.pallas_fused import (pallas_nv12_preprocess,
                                           pallas_nv12_to_rgb)

    B, H, W = 2, 270, 256
    rows = H * 3 // 2
    assert rows % 8 != 0
    base = RNG.integers(0, 256, (B, rows, W), dtype=np.uint8)
    x = jnp.asarray(base)
    xp = jnp.asarray(np.concatenate(
        [base, np.zeros((B, 16, W), np.uint8)], axis=1))

    got = np.asarray(pallas_nv12_to_rgb(x, src_w=W, src_h=H,
                                        space=ColorSpace.BT_709,
                                        crange=ColorRange.MPEG))
    padded = np.asarray(pallas_nv12_to_rgb(xp, src_w=W, src_h=H,
                                           space=ColorSpace.BT_709,
                                           crange=ColorRange.MPEG))
    assert np.array_equal(got, padded)
    cc = ColorspaceConversionContext(ColorSpace.BT_709, ColorRange.MPEG)
    want = np.asarray(csc.convert_batch(
        (x,), PixelFormat.NV12, PixelFormat.RGB, W, H, cc,
        use_pallas=False)[0])
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    pre = np.asarray(pallas_nv12_preprocess(x, src_w=W, src_h=H,
                                            dst_w=64, dst_h=64))
    pre_p = np.asarray(pallas_nv12_preprocess(xp, src_w=W, src_h=H,
                                              dst_w=64, dst_h=64))
    assert np.array_equal(pre, pre_p)

    # uint16 (P10-style MSB-aligned) takes the same unaligned sublane
    # starts but with 16-bit refs — a separate Mosaic layout path that
    # interpret mode cannot prove compiles
    base16 = (RNG.integers(0, 1024, (B, rows, W)).astype(np.uint16) << 6)
    x16 = jnp.asarray(base16)
    xp16 = jnp.asarray(np.concatenate(
        [base16, np.zeros((B, 16, W), np.uint16)], axis=1))
    pre16 = np.asarray(pallas_nv12_preprocess(x16, src_w=W, src_h=H,
                                              dst_w=64, dst_h=64))
    pre16_p = np.asarray(pallas_nv12_preprocess(xp16, src_w=W, src_h=H,
                                                dst_w=64, dst_h=64))
    assert np.array_equal(pre16, pre16_p)
