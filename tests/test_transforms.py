"""Transform wrapper tests: the Py* public classes over Surfaces.

Ports the shape of reference tests/test_PySurfaceConverter.py,
test_PySurfaceResizer.py, test_PySurfaceRotator.py, test_PySurfaceUD.py:
Run/RunAsync semantics, cc-ctx error paths, uploader/downloader round trips.
"""

import numpy as np
import pytest

import vali_tpu as vali
from vali_tpu.core.formats import format_info

F = vali.PixelFormat
W, H = 64, 48
RNG = np.random.default_rng(7)


def make_filled(fmt, w=W, h=H):
    info = format_info(fmt)
    surf = vali.Surface.Make(fmt, w, h)
    arrays = []
    for (ph, pw) in info.plane_dims(w, h):
        if info.dtype == np.uint8:
            arrays.append(RNG.integers(0, 256, (ph, pw), dtype=np.uint8))
        elif info.dtype == np.uint16:
            arrays.append(RNG.integers(0, 65536, (ph, pw), dtype=np.uint16))
        else:
            arrays.append(RNG.random((ph, pw), dtype=np.float32))
    up = vali.PyFrameUploader(gpu_id=0)
    from vali_tpu.memory.host import planes_to_host_frame

    ok, _ = up.Run(planes_to_host_frame(arrays), surf)
    assert ok
    return surf, arrays


def test_converter_run_and_async():
    surf, _ = make_filled(F.NV12)
    dst = vali.Surface.Make(F.RGB, W, H)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    ok, info = cvt.Run(surf, dst)
    assert ok and info == vali.TaskExecInfo.SUCCESS
    ok, info = cvt.RunAsync(surf, dst)
    assert ok
    ev = vali.CudaStreamEvent(cvt.Stream, 0)
    ev.Record()
    ev.Wait()


def test_converter_unsupported_params():
    surf, _ = make_filled(F.NV12)
    dst = vali.Surface.Make(F.RGB, W, H)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_601,
                                          vali.ColorRange.MPEG)
    ok, info = cvt.Run(surf, dst, cc)
    assert not ok
    assert info == vali.TaskExecInfo.UNSUPPORTED_FMT_CONV_PARAMS


def test_converter_size_mismatch():
    surf, _ = make_filled(F.NV12)
    dst = vali.Surface.Make(F.RGB, W // 2, H // 2)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    ok, info = cvt.Run(surf, dst)
    assert not ok
    assert info == vali.TaskExecInfo.INVALID_INPUT


def test_converter_unsupported_pair_raises():
    surf, _ = make_filled(F.YUV444)
    dst = vali.Surface.Make(F.NV12, W, H)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    with pytest.raises(ValueError):
        cvt.Run(surf, dst)


def test_converter_conversions_list():
    assert len(vali.PySurfaceConverter.Conversions()) == 23


def test_resizer():
    surf, _ = make_filled(F.RGB)
    dst = vali.Surface.Make(F.RGB, W // 2, H // 2)
    rsz = vali.PySurfaceResizer(F.RGB, gpu_id=0)
    ok, info = rsz.Run(surf, dst)
    assert ok and info == vali.TaskExecInfo.SUCCESS
    assert dst.to_numpy().shape == (H // 2, W // 2, 3)


def test_resizer_format_mismatch():
    surf, _ = make_filled(F.NV12)
    dst = vali.Surface.Make(F.NV12, W // 2, H // 2)
    rsz = vali.PySurfaceResizer(F.RGB, gpu_id=0)
    ok, info = rsz.Run(surf, dst)
    assert not ok and info == vali.TaskExecInfo.SRC_DST_FMT_MISMATCH


def test_resizer_unsupported_format_ctor():
    # YUV420_10bit has no resize path (parity: the reference ctor throws
    # for unknown formats; Y/GRAY12/P10/P12/YUV422 are documented
    # beyond-reference extensions here)
    with pytest.raises(RuntimeError):
        vali.PySurfaceResizer(F.YUV420_10bit, gpu_id=0)


def test_rotator_90():
    surf, arrays = make_filled(F.Y)
    dst = vali.Surface.Make(F.Y, H, W)
    rot = vali.PySurfaceRotator(gpu_id=0)
    ok, info = rot.Run(surf, dst, 90.0)
    assert ok
    assert np.array_equal(dst.to_numpy(), np.rot90(arrays[0], k=1))
    assert F.NV12 not in rot.SupportedFormats


def test_rotator_fmt_mismatch():
    surf, _ = make_filled(F.Y)
    dst = vali.Surface.Make(F.RGB, H, W)
    rot = vali.PySurfaceRotator(gpu_id=0)
    ok, info = rot.Run(surf, dst, 90.0)
    assert not ok and info == vali.TaskExecInfo.SRC_DST_FMT_MISMATCH


def test_ud():
    surf, _ = make_filled(F.NV12)
    dst = vali.Surface.Make(F.RGB, W // 2, H // 2)
    ud_op = vali.PySurfaceUD(gpu_id=0)
    ok, info = ud_op.Run(surf, dst)
    assert ok
    assert len(vali.PySurfaceUD.SupportedFormats()) == 10


def test_ud_unsupported():
    surf, _ = make_filled(F.RGB)
    dst = vali.Surface.Make(F.YUV444, W, H)
    ud_op = vali.PySurfaceUD(gpu_id=0)
    ok, info = ud_op.Run(surf, dst)
    assert not ok and info == vali.TaskExecInfo.NOT_SUPPORTED


def test_upload_download_roundtrip():
    info = format_info(F.NV12)
    frame = RNG.integers(0, 256, info.host_size(W, H), dtype=np.uint8)
    surf = vali.Surface.Make(F.NV12, W, H)
    up = vali.PyFrameUploader(gpu_id=0)
    ok, _ = up.Run(frame, surf)
    assert ok
    down = vali.PySurfaceDownloader(gpu_id=0)
    out = np.zeros(info.host_size(W, H), dtype=np.uint8)
    ok, _ = down.Run(surf, out)
    assert ok
    assert np.array_equal(out, frame)


def test_download_auto_resize():
    surf, arrays = make_filled(F.Y)
    down = vali.PySurfaceDownloader(gpu_id=0)
    out = np.zeros(1, dtype=np.uint8)  # wrong size -> auto-resized
    ok, _ = down.Run(surf, out)
    assert ok
    assert out.size == W * H
    assert np.array_equal(out.reshape(H, W), arrays[0])


def test_upload_wrong_size():
    surf = vali.Surface.Make(F.NV12, W, H)
    up = vali.PyFrameUploader(gpu_id=0)
    ok, info = up.Run(np.zeros(10, dtype=np.uint8), surf)
    assert not ok and info == vali.TaskExecInfo.INVALID_INPUT


def test_converter_nv12_rgb_pipeline_psnr():
    """decode-free version of the reference's nv12->rgb golden check:
    gray ramp NV12 -> RGB should reproduce the luma ramp in all channels."""
    info = format_info(F.NV12)
    y = np.tile(np.linspace(16, 235, W).astype(np.uint8), (H, 1))
    uv = np.full((H // 2, W), 128, dtype=np.uint8)
    frame = np.concatenate([y.reshape(-1), uv.reshape(-1)])
    surf = vali.Surface.Make(F.NV12, W, H)
    up = vali.PyFrameUploader(gpu_id=0)
    assert up.Run(frame, surf)[0]
    dst = vali.Surface.Make(F.RGB, W, H)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_709,
                                          vali.ColorRange.MPEG)
    assert cvt.Run(surf, dst, cc)[0]
    rgb = dst.to_numpy().astype(np.float64)
    # neutral chroma -> R=G=B = 1.164*(Y-16)
    want = np.clip(1.164 * (y.astype(np.float64) - 16), 0, 255)
    for c in range(3):
        assert np.abs(rgb[..., c] - want).max() <= 1.0


def test_resize_yuv422_and_yuv444():
    for fmt in (F.YUV444,):
        surf, _ = make_filled(fmt)
        dst = vali.Surface.Make(fmt, W // 2, H // 2)
        rsz = vali.PySurfaceResizer(fmt, gpu_id=0)
        ok, info = rsz.Run(surf, dst)
        assert ok, info


def test_rotate_yuv422_and_gray12():
    surf, arrays = make_filled(F.YUV422)
    dst = vali.Surface.Make(F.YUV422, H, W)
    rot = vali.PySurfaceRotator(gpu_id=0)
    ok, info = rot.Run(surf, dst, 90.0)
    assert ok, info
    assert np.array_equal(dst.plane_arrays()[0][...],
                          np.rot90(arrays[0], k=1))

    g12, arrays12 = make_filled(F.GRAY12)
    dst12 = vali.Surface.Make(F.GRAY12, H, W)
    ok, info = rot.Run(g12, dst12, 90.0)
    assert ok, info
    assert np.array_equal(dst12.to_numpy(), np.rot90(arrays12[0], k=1))


def test_cpu_converter_planar_rgb_swizzle():
    """RGB_PLANAR <-> YUV444 via swscale's GBRP with plane-pointer
    swizzling (no copies)."""
    rgbp = RNG.integers(0, 255, (3, H, W), dtype=np.uint8)
    conv = vali.PyFrameConverter(W, H, F.RGB_PLANAR, F.RGB)
    dst = np.zeros(W * H * 3, np.uint8)
    ok, info = conv.Run(rgbp.reshape(-1), dst)
    assert ok, info
    want = np.moveaxis(rgbp, 0, -1).reshape(-1)
    assert np.array_equal(dst, want)


def test_rotator_nv12_not_supported():
    """parity: reference test_PySurfaceRotator.test_unsupported_params —
    rotating NV12 returns NOT_SUPPORTED."""
    surf, _ = make_filled(F.NV12)
    dst = vali.Surface.Make(F.NV12, H, W)
    rot = vali.PySurfaceRotator(gpu_id=0)
    ok, info = rot.Run(surf, dst, 90.0)
    assert not ok
    assert info == vali.TaskExecInfo.NOT_SUPPORTED


def test_resizer_turbo_matches_xla():
    """turbo=True (banded Pallas path) stays within rounding of the
    default XLA resizer for NV12."""
    w, h, dw, dh = 256, 96, 128, 48
    rng = np.random.default_rng(4)
    nv12 = rng.integers(0, 256, (h * 3 // 2, w), dtype=np.uint8)
    src = vali.Surface.from_numpy(nv12, vali.PixelFormat.NV12,
                                  width=w, height=h)
    ref_dst = vali.Surface.Make(vali.PixelFormat.NV12, dw, dh)
    tur_dst = vali.Surface.Make(vali.PixelFormat.NV12, dw, dh)
    assert vali.PySurfaceResizer(vali.PixelFormat.NV12, gpu_id=0,
                                 method="lanczos_aa").Run(src, ref_dst)[0]
    assert vali.PySurfaceResizer(vali.PixelFormat.NV12, gpu_id=0,
                                 method="lanczos_aa",
                                 turbo=True).Run(src, tur_dst)[0]
    a = ref_dst.to_numpy().astype(int)
    b = tur_dst.to_numpy().astype(int)
    assert np.abs(a - b).max() <= 3


def test_rotator_yuv422_right_angle_chroma_geometry():
    """YUV422 rot90/270: the horizontal-subsampling axis does not rotate
    with the content, so chroma goes through full resolution and back —
    dst planes must match the dst YUV422 layout (was: wrong-shaped
    planes swapped in with success reported)."""
    w, h = 16, 8
    rng = np.random.default_rng(0)
    planes = [rng.integers(0, 255, (h, w), np.uint8),
              rng.integers(0, 255, (h, w // 2), np.uint8),
              rng.integers(0, 255, (h, w // 2), np.uint8)]
    from vali_tpu.memory.host import planes_to_host_frame

    src = vali.Surface.Make(vali.PixelFormat.YUV422, w, h)
    assert vali.PyFrameUploader(gpu_id=0).Run(
        planes_to_host_frame(planes), src)[0]
    dst = vali.Surface.Make(vali.PixelFormat.YUV422, h, w)
    rot = vali.PySurfaceRotator(gpu_id=0)
    ok, info = rot.Run(src, dst, 90.0)
    assert ok, info
    got = [np.asarray(p) for p in dst.plane_arrays()]
    assert got[0].shape == (w, h)
    assert got[1].shape == (w, h // 2) and got[2].shape == (w, h // 2)
    assert np.array_equal(got[0], np.rot90(planes[0], 1))


def test_rotator_dynamic_angle_no_retrace():
    """Arbitrary angles are traced (one compile per shape): many angles
    must reuse the same executable and keep producing valid output."""
    w, h = 32, 24
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 255, (h, w * 3), np.uint8)
    src = vali.Surface.from_numpy(rgb, vali.PixelFormat.RGB,
                                  width=w, height=h)
    dst = vali.Surface.Make(vali.PixelFormat.RGB, w, h)
    rot = vali.PySurfaceRotator(gpu_id=0)
    from vali_tpu.transforms import _jit_rotate_dynamic

    base = _jit_rotate_dynamic._cache_size()
    for ang in (7.5, 13.25, 101.1, 222.9):
        ok, _ = rot.Run(src, dst, ang, shift_x=w / 2, shift_y=h / 2)
        assert ok
        assert np.isfinite(dst.to_numpy().astype(np.float64)).all()
    assert _jit_rotate_dynamic._cache_size() - base <= 1, \
        "each new angle recompiled"


def test_downloader_rejects_lossy_destinations():
    """Destinations the flat byte-copy cannot express must fail instead
    of silently writing into a temporary (non-contiguous dst) or
    crashing (itemsize that does not divide the surface bytes)."""
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 255, (4, 12), np.uint8)
    src = vali.Surface.from_numpy(rgb, vali.PixelFormat.RGB,
                                  width=4, height=4)
    dl = vali.PySurfaceDownloader(gpu_id=0)
    # non-contiguous destination: reshape(-1) would copy
    dst_t = np.zeros((12, 4), np.uint8).T
    ok, info = dl.Run(src, dst_t)
    assert not ok and info == vali.TaskExecInfo.INVALID_INPUT
    assert dst_t.sum() == 0
    # 9-byte Y surface into float32: itemsize does not divide
    ysurf = vali.Surface.from_numpy(
        rng.integers(0, 255, (3, 3), np.uint8), vali.PixelFormat.Y,
        width=3, height=3)
    ok, info = dl.Run(ysurf, np.zeros(4, np.float32))
    assert not ok and info == vali.TaskExecInfo.INVALID_INPUT


def test_resizer_p10_turbo():
    """P10 is a beyond-reference resizer format; turbo routes it through
    the banded kernel's float32 path."""
    w, h, dw, dh = 128, 64, 64, 32
    rng = np.random.default_rng(3)
    p10 = (rng.integers(0, 1024, (h * 3 // 2, w), np.uint16) << 6)
    src = vali.Surface.from_numpy(p10, vali.PixelFormat.P10,
                                  width=w, height=h)
    out_ref = vali.Surface.Make(vali.PixelFormat.P10, dw, dh)
    out_tur = vali.Surface.Make(vali.PixelFormat.P10, dw, dh)
    assert vali.PySurfaceResizer(vali.PixelFormat.P10, gpu_id=0,
                                 method="lanczos_aa").Run(src, out_ref)[0]
    assert vali.PySurfaceResizer(vali.PixelFormat.P10, gpu_id=0,
                                 method="lanczos_aa",
                                 turbo=True).Run(src, out_tur)[0]
    a = out_ref.to_numpy().view(np.uint16).astype(int)
    b = out_tur.to_numpy().view(np.uint16).astype(int)
    assert np.abs(a - b).max() <= 1


def test_rotator_static_and_dynamic_paths_agree():
    """The traced-angle path must produce exactly what the static-jit
    path produces for the same (non-canonical) parameters."""
    from vali_tpu.transforms import _jit_rotate, _jit_rotate_dynamic
    import jax.numpy as jnp

    w, h = 40, 32
    rng = np.random.default_rng(6)
    plane = (rng.integers(0, 255, (1, h, w), np.uint8),)
    kw = dict(fmt=vali.PixelFormat.Y, sw=w, sh=h, dw=w, dh=h)
    for ang, sx, sy in ((33.0, 20.0, 16.0), (200.5, 5.0, 30.0)):
        a = np.asarray(_jit_rotate(plane, angle=ang, shift_x=sx,
                                   shift_y=sy, **kw)[0])
        b = np.asarray(_jit_rotate_dynamic(
            plane, jnp.float32(ang), jnp.float32(sx), jnp.float32(sy),
            **kw)[0])
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


@pytest.mark.parametrize("fmt", ["Y", "YUV420", "YUV444", "RGB_PLANAR",
                                 "RGB_32F_PLANAR", "GRAY12"])
def test_resizer_turbo_planar_formats(fmt):
    """turbo routes every planar format through the banded plane-resize
    kernel and stays within rounding of the XLA path."""
    from vali_tpu.core.formats import format_info
    from vali_tpu.memory.host import planes_to_host_frame

    F = vali.PixelFormat[fmt]
    w, h, dw, dh = 128, 96, 64, 48
    rng = np.random.default_rng(8)
    info = format_info(F)
    planes = []
    for (ph, pw) in info.plane_dims(w, h):
        if info.dtype == np.dtype(np.float32):
            planes.append(rng.random((ph, pw)).astype(np.float32))
        else:
            planes.append(rng.integers(
                0, np.iinfo(info.dtype).max, (ph, pw),
                dtype=info.dtype))
    src = vali.Surface.Make(F, w, h)
    assert vali.PyFrameUploader(gpu_id=0).Run(
        planes_to_host_frame(planes), src)[0]
    ref_dst = vali.Surface.Make(F, dw, dh)
    tur_dst = vali.Surface.Make(F, dw, dh)
    assert vali.PySurfaceResizer(F, gpu_id=0,
                                 method="lanczos_aa").Run(src, ref_dst)[0]
    assert vali.PySurfaceResizer(F, gpu_id=0, method="lanczos_aa",
                                 turbo=True).Run(src, tur_dst)[0]
    for a, b in zip(ref_dst.plane_arrays(), tur_dst.plane_arrays()):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype == np.float32:
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)
        else:
            tol = 3 if a.dtype == np.uint8 else 12  # GRAY12 u16 LSBs
            assert np.abs(a.astype(int) - b.astype(int)).max() <= tol


def test_empty_surface_returns_invalid_input_not_crash():
    """Wrapper contract: Run returns (bool, TaskExecInfo) — an empty
    (default-constructed) Surface must map to INVALID_INPUT, not leak a
    RuntimeError from plane_arrays (PySurfaceResizer already did this;
    Converter/Rotator/UD now match)."""
    empty_a, empty_b = vali.Surface(), vali.Surface()
    conv = vali.PySurfaceConverter(gpu_id=0)
    ok, info = conv.Run(empty_a, empty_b)
    assert not ok and info == vali.TaskExecInfo.INVALID_INPUT

    # typed-but-real surfaces against an empty peer
    surf, _ = make_filled(F.NV12)
    rot = vali.PySurfaceRotator(gpu_id=0)
    # an empty dst shares the UNDEFINED format -> format mismatch is an
    # acceptable earlier rejection; the contract is only "no exception"
    ok, info = rot.Run(surf, empty_b, 90.0)
    assert not ok


def test_rotator_right_angle_with_shift_uses_traced_path(monkeypatch):
    """A right angle with a non-canonical shift must take the
    traced-scalar jit (one compile per SHAPE); the static path would
    recompile for every distinct shift value (30-240s each on axon)."""
    import vali_tpu.transforms as T

    surf, _ = make_filled(F.RGB)
    dst = vali.Surface.Make(F.RGB, W, H)
    called = {}
    real = T._jit_rotate_dynamic

    def spy(*a, **k):
        called["dynamic"] = True
        return real(*a, **k)

    monkeypatch.setattr(T, "_jit_rotate_dynamic", spy)
    rot = vali.PySurfaceRotator(gpu_id=0)
    ok, _ = rot.Run(surf, dst, 90.0, shift_x=3.5, shift_y=1.0)
    assert ok
    assert called.get("dynamic"), "right-angle+shift took the static path"

    # canonical right angles (no shift) still take the static rot90 path
    called.clear()
    dst2 = vali.Surface.Make(F.RGB, H, W)
    ok, _ = rot.Run(surf, dst2, 90.0)
    assert ok
    assert "dynamic" not in called
