"""Golden-frame fidelity tests against the reference's NPP/CUDA dumps.

This is the cross-implementation gate from BASELINE.md: decode the reference
clips, run the UD transform, and compare with the reference's pre-dumped
``640x360_<src>_<dst>.raw`` files (produced by its CUDA texture kernel /
NPP Lanczos) within the same PSNR thresholds its own tests use
(tests/test_PySurfaceUD.py, psnr >= 42... the reference uses 42 for CSC and
a looser bound for resampling differences).
"""

import json
import os

import numpy as np
import pytest

import vali_tpu as vali
from vali_tpu.core.formats import format_info

DATA = "/root/reference/tests/data"
GT_PATH = "/root/reference/tests/gt_files.json"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference test data not available")

TARGET_W, TARGET_H = 640, 360
PSNR_THRESHOLD = 42.0


def psnr(gt, dist, peak=None):
    gt = np.asarray(gt, dtype=np.float64)
    dist = np.asarray(dist, dtype=np.float64)
    mse = np.mean((gt - dist) ** 2)
    if mse == 0:
        return float("inf")
    if peak is None:
        peak = 255.0 if gt.max() > 2.0 else 1.0
    return 10.0 * np.log10(peak**2 / mse)


def decode_first_frame(clip):
    with open(GT_PATH) as f:
        rec = json.load(f)[clip]
    uri = os.path.join("/root/reference/tests", rec["uri"])
    dec = vali.PyDecoder(uri, {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    ok, info = dec.DecodeSingleFrame(frame)
    assert ok, info
    return frame, dec


def yuv420_to_nv12_host(frame_bytes, w, h):
    """Repack an I420 host frame into NV12 on host."""
    y = frame_bytes[:w * h].reshape(h, w)
    u = frame_bytes[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
    v = frame_bytes[w * h + w * h // 4:].reshape(h // 2, w // 2)
    uv = np.empty((h // 2, w), dtype=np.uint8)
    uv[:, 0::2] = u
    uv[:, 1::2] = v
    return np.concatenate([y.reshape(-1), uv.reshape(-1)])


def yuv420_10_to_p10_host(frame_bytes, w, h):
    """YUV420P10 (LSB 10-bit) -> P10 (MSB-aligned 16-bit, interleaved UV)."""
    vals = frame_bytes.view(np.uint16)
    y = vals[:w * h].reshape(h, w)
    u = vals[w * h:w * h + w * h // 4].reshape(h // 2, w // 2)
    v = vals[w * h + w * h // 4:].reshape(h // 2, w // 2)
    uv = np.empty((h // 2, w), dtype=np.uint16)
    uv[:, 0::2] = u
    uv[:, 1::2] = v
    out = np.concatenate([(y.astype(np.uint16) << 6).reshape(-1),
                          (uv << 6).reshape(-1)])
    return out.view(np.uint8)


def load_golden(src_fmt, dst_fmt, dtype, shape):
    name = (f"{TARGET_W}x{TARGET_H}_PixelFormat.{src_fmt}"
            f"_PixelFormat.{dst_fmt}.raw")
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"golden {name} missing")
    return np.fromfile(path, dtype=dtype).reshape(shape)


def run_ud(src_surface, dst_fmt):
    dst = vali.Surface.Make(dst_fmt, TARGET_W, TARGET_H)
    ud = vali.PySurfaceUD(gpu_id=0)
    ok, info = ud.Run(src_surface, dst)
    assert ok, info
    return dst


@pytest.mark.parametrize("dst_fmt,golden_name,dtype", [
    (vali.PixelFormat.RGB, "RGB", np.uint8),
    (vali.PixelFormat.RGB_PLANAR, "RGB_PLANAR", np.uint8),
    (vali.PixelFormat.RGB_32F, "RGB_32F", np.float32),
    (vali.PixelFormat.RGB_32F_PLANAR, "RGB_32F_PLANAR", np.float32),
    (vali.PixelFormat.YUV444, "YUV444", np.uint8),
])
def test_ud_nv12_goldens(dst_fmt, golden_name, dtype):
    frame, dec = decode_first_frame("basic")
    nv12 = yuv420_to_nv12_host(frame, dec.Width, dec.Height)
    surf = vali.Surface.from_numpy(nv12, vali.PixelFormat.NV12,
                                   width=dec.Width, height=dec.Height)
    dst = run_ud(surf, dst_fmt)
    golden = load_golden("NV12", golden_name, dtype, -1)
    got = dst.to_numpy().reshape(-1)
    if dtype == np.float32:
        score = psnr(golden, got, peak=1.0)
    else:
        score = psnr(golden, got, peak=255.0)
    assert score > PSNR_THRESHOLD, f"PSNR {score:.2f} vs golden {golden_name}"


def test_ud_yuv420_golden():
    frame, dec = decode_first_frame("basic")
    info = format_info(vali.PixelFormat.YUV420)
    surf = vali.Surface.from_numpy(frame, vali.PixelFormat.YUV420,
                                   width=dec.Width, height=dec.Height)
    dst = run_ud(surf, vali.PixelFormat.YUV444)
    golden = load_golden("YUV420", "YUV444", np.uint8, -1)
    score = psnr(golden, dst.to_numpy().reshape(-1))
    assert score > PSNR_THRESHOLD, f"PSNR {score:.2f}"


@pytest.mark.parametrize("dst_fmt,golden_name,dtype", [
    (vali.PixelFormat.YUV444_10bit, "YUV444_10bit", np.uint16),
    (vali.PixelFormat.RGB_32F, "RGB_32F", np.float32),
    (vali.PixelFormat.RGB_32F_PLANAR, "RGB_32F_PLANAR", np.float32),
])
def test_ud_p10_goldens(dst_fmt, golden_name, dtype):
    frame, dec = decode_first_frame("hevc10")
    p10 = yuv420_10_to_p10_host(frame, dec.Width, dec.Height)
    surf = vali.Surface.from_numpy(p10.view(np.uint16),
                                   vali.PixelFormat.P10,
                                   width=dec.Width, height=dec.Height)
    dst = run_ud(surf, dst_fmt)
    golden = load_golden("P10", golden_name, dtype, -1)
    got = dst.to_numpy().reshape(-1)
    peak = 1.0 if dtype == np.float32 else 65535.0
    score = psnr(golden, got, peak=peak)
    assert score > PSNR_THRESHOLD, f"PSNR {score:.2f} vs golden {golden_name}"


def test_ud_yuv420_10bit_golden():
    frame, dec = decode_first_frame("hevc10")
    surf = vali.Surface.from_numpy(frame.view(np.uint16),
                                   vali.PixelFormat.YUV420_10bit,
                                   width=dec.Width, height=dec.Height)
    dst = run_ud(surf, vali.PixelFormat.YUV444_10bit)
    golden = load_golden("YUV420_10bit", "YUV444_10bit", np.uint16, -1)
    # this golden stores LSB 10-bit values (unlike the P10 one)
    got = dst.to_numpy().reshape(-1)
    score = psnr(golden, got, peak=65535.0)
    assert score > PSNR_THRESHOLD, f"PSNR {score:.2f}"


def test_rotation_goldens():
    """Rotate frame 0 of the rotation clip by 90/180/270 and compare with
    the reference's frame_0_{angle}_deg.jpg goldens (decoded via FFmpeg)."""
    frame, dec = decode_first_frame("rotation_90_deg")
    w, h = dec.Width, dec.Height
    surf = vali.Surface.from_numpy(frame, vali.PixelFormat.YUV420,
                                   width=w, height=h)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    rgb = vali.Surface.Make(vali.PixelFormat.RGB, w, h)
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_601,
                                          vali.ColorRange.MPEG)
    ok, info = cvt.Run(surf, rgb, cc)
    assert ok, info

    rot = vali.PySurfaceRotator(gpu_id=0)
    for angle in (90.0, 180.0, 270.0):
        dw, dh = (h, w) if angle in (90.0, 270.0) else (w, h)
        dst = vali.Surface.Make(vali.PixelFormat.RGB, dw, dh)
        ok, info = rot.Run(rgb, dst, angle)
        assert ok, info

        golden_path = os.path.join(DATA, f"frame_0_{int(angle)}_deg.jpg")
        if not os.path.exists(golden_path):
            continue
        gdec = vali.PyDecoder(golden_path, {}, gpu_id=-1)
        gframe = np.zeros(gdec.HostFrameSize, dtype=np.uint8)
        ok, _ = gdec.DecodeSingleFrame(gframe)
        assert ok
        gconv = vali.PyFrameConverter(gdec.Width, gdec.Height, gdec.Format,
                                      vali.PixelFormat.RGB)
        grgb = np.zeros(gdec.Width * gdec.Height * 3, dtype=np.uint8)
        ok, _ = gconv.Run(gframe, grgb, cc)
        assert ok
        assert (gdec.Width, gdec.Height) == (dw, dh)
        score = psnr(grgb, dst.to_numpy().reshape(-1))
        # JPEG golden adds its own loss; accept a looser floor
        assert score > 25.0, f"{angle} deg PSNR {score:.2f}"


def test_resize_nv12_golden_bit_exact():
    """parity: test_PySurfaceResizer.test_resize_nv12 — resize 16 decoded
    frames 848x464 -> 424x232 and compare against the reference's
    NVDEC+NPP-produced golden (tests/data/test_small.nv12).

    Result: BIT-EXACT (PSNR = inf) — h264 decode is spec-exact and the
    matmul Lanczos reproduces NPP's arithmetic including rounding.
    """
    gt_path = os.path.join(DATA, "test_small.nv12")
    if not os.path.exists(gt_path):
        pytest.skip("golden test_small.nv12 missing")
    dec = vali.PyDecoder(os.path.join(DATA, "test.mp4"), {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, np.uint8)
    up = vali.PyFrameUploader(gpu_id=0)
    rsz = vali.PySurfaceResizer(vali.PixelFormat.NV12, gpu_id=0)
    dwn = vali.PySurfaceDownloader(gpu_id=0)
    with open(gt_path, "rb") as gt:
        for i in range(16):
            ok, _ = dec.DecodeSingleFrame(frame)
            assert ok
            nv12 = yuv420_to_nv12_host(frame, dec.Width, dec.Height)
            src = vali.Surface.from_numpy(nv12, vali.PixelFormat.NV12,
                                          width=dec.Width, height=dec.Height)
            dst = vali.Surface.Make(vali.PixelFormat.NV12, 424, 232)
            assert rsz.Run(src, dst)[0]
            out = np.zeros(dst.HostSize, np.uint8)
            assert dwn.Run(dst, out)[0]
            gt_frame = np.fromfile(gt, np.uint8, dst.HostSize)
            assert np.array_equal(out, gt_frame), f"frame {i} differs"
