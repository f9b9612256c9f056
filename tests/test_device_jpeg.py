"""TPU-assisted JPEG encode tests (device DCT + host entropy coding)."""

import numpy as np
import pytest

import vali_tpu as vali
from vali_tpu.engine.jpeg import jpeg_encode_device
from vali_tpu.ops.jpeg import dct_matrix, quant_tables

F = vali.PixelFormat
H, W = 96, 128
RNG = np.random.default_rng(9)


def smooth_rgb():
    yy, xx = np.mgrid[0:H, 0:W]
    return np.stack([
        128 + 90 * np.sin(yy / 19.0) * np.cos(xx / 13.0),
        128 + 90 * np.cos(yy / 17.0),
        128 + 90 * np.sin(xx / 23.0),
    ], -1).astype(np.uint8)


def decode_jpeg(blob):
    import os
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".jpg", delete=False) as f:
        f.write(bytes(blob))
        path = f.name
    try:
        dec = vali.PyDecoder(path, {}, gpu_id=-1)
        frame = np.zeros(dec.HostFrameSize, np.uint8)
        ok, _ = dec.DecodeSingleFrame(frame)
        assert ok
        conv = vali.PyFrameConverter(dec.Width, dec.Height, dec.Format,
                                     F.RGB)
        rgb = np.zeros(dec.Width * dec.Height * 3, np.uint8)
        cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_601,
                                              vali.ColorRange.JPEG)
        ok, _ = conv.Run(frame, rgb, cc)
        assert ok
        return rgb.reshape(dec.Height, dec.Width, 3)
    finally:
        os.unlink(path)


def psnr(a, b):
    mse = ((np.asarray(a, np.float64) - np.asarray(b, np.float64))**2).mean()
    return 10 * np.log10(255**2 / max(mse, 1e-12))


def test_dct_matrix_orthonormal():
    d = dct_matrix().astype(np.float64)
    assert np.allclose(d @ d.T, np.eye(8), atol=1e-6)


def test_quant_tables_match_ijg():
    # quality 50 returns the Annex K base tables unscaled
    ql, qc = quant_tables(50)
    assert ql[0, 0] == 16 and qc[0, 0] == 17
    ql90, _ = quant_tables(90)
    assert ql90[0, 0] == 3  # (16*20+50)//100
    ql10, _ = quant_tables(10)
    assert ql10[0, 0] == 80  # (16*500+50)//100


def test_device_jpeg_rgb_roundtrip():
    img = smooth_rgb()
    surf = vali.Surface.from_numpy(img, F.RGB)
    blobs = jpeg_encode_device([surf, surf], quality=90)
    assert len(blobs) == 2
    assert bytes(blobs[0][:3]) == b"\xff\xd8\xff"
    decoded = decode_jpeg(blobs[0])
    assert psnr(decoded, img) > 38.0


def test_device_jpeg_matches_host_quality():
    """Device-DCT JPEGs should decode to images of similar fidelity and
    size to pure-host libjpeg at the same quality."""
    img = smooth_rgb()
    surf = vali.Surface.from_numpy(img, F.RGB)
    dev = jpeg_encode_device([surf], quality=85)[0]
    host_enc = vali.PyNvJpegEncoder(gpu_id=0)
    host = host_enc.Run(host_enc.Context(85, F.RGB), [surf])[0][0]
    p_dev = psnr(decode_jpeg(dev), img)
    p_host = psnr(decode_jpeg(host), img)
    assert abs(p_dev - p_host) < 3.0, (p_dev, p_host)
    assert 0.5 < len(dev) / len(host) < 2.0


def test_device_jpeg_grayscale():
    y = RNG.integers(0, 256, (H, W), dtype=np.uint8)
    surf = vali.Surface.from_numpy(y, F.Y)
    blobs = jpeg_encode_device([surf], quality=90)
    assert bytes(blobs[0][:2]) == b"\xff\xd8"


def test_device_jpeg_yuv420():
    planes = [RNG.integers(0, 256, (H, W), np.uint8),
              np.full((H // 2, W // 2), 100, np.uint8),
              np.full((H // 2, W // 2), 160, np.uint8)]
    surf = vali.Surface.from_numpy(planes, F.YUV420)
    blobs = jpeg_encode_device([surf], quality=85)
    assert bytes(blobs[0][:2]) == b"\xff\xd8"
    decoded = decode_jpeg(blobs[0])
    assert decoded.shape == (H, W, 3)


def test_device_jpeg_odd_size():
    """Non-multiple-of-8/16 geometry must produce a valid JPEG."""
    img = smooth_rgb()[:90, :100]
    surf = vali.Surface.from_numpy(np.ascontiguousarray(img), F.RGB)
    blobs = jpeg_encode_device([surf], quality=85)
    decoded = decode_jpeg(blobs[0])
    assert decoded.shape == (90, 100, 3)
    assert psnr(decoded, img) > 35.0


def test_device_jpeg_odd_dimensions_subsampled():
    """Odd geometry + 4:2:0: chroma is edge-padded to even before the
    2x2 mean (used to crash with a reshape TypeError on e.g. 101x91)."""
    rng = np.random.default_rng(9)
    rgb = rng.integers(0, 255, (91, 101 * 3), np.uint8)
    s = vali.Surface.from_numpy(rgb, F.RGB, width=101, height=91)
    blobs = jpeg_encode_device([s], quality=85)
    assert bytes(blobs[0][:2]) == b"\xff\xd8"
    blobs[0][0] = 0  # returned packets are writable (reference parity)


def test_device_jpeg_yuv444_subsample_override():
    """YUV444 defaults to 4:4:4 output but an explicit subsample420=True
    is honored (smaller file) instead of silently dropped."""
    rng = np.random.default_rng(10)
    planes = [rng.integers(0, 255, (64, 64), np.uint8) for _ in range(3)]
    from vali_tpu.memory.host import planes_to_host_frame

    s = vali.Surface.Make(F.YUV444, 64, 64)
    assert vali.PyFrameUploader(gpu_id=0).Run(
        planes_to_host_frame(planes), s)[0]
    full = jpeg_encode_device([s], quality=85)
    sub = jpeg_encode_device([s], quality=85, subsample420=True)
    assert len(sub[0]) < len(full[0])


def test_yuv420_subsample_false_raises():
    """YUV420 input is already 4:2:0; asking for 4:4:4 output must raise
    instead of silently ignoring the override."""
    from vali_tpu.engine.jpeg import jpeg_encode_device

    surf = vali.Surface.Make(vali.PixelFormat.YUV420, 32, 32)
    with pytest.raises(ValueError, match="already 4:2:0"):
        jpeg_encode_device([surf], subsample420=False)


def test_transform_batch_yuv420_subsample_false_raises():
    """Same guard at the op level: jpeg_transform_batch is public API, so
    the impossible YUV420 + subsample420=False combination must raise
    here too, not only in the engine wrapper (which is bypassable)."""
    import jax.numpy as jnp

    from vali_tpu.core.enums import PixelFormat
    from vali_tpu.ops.jpeg import jpeg_transform_batch

    y = jnp.zeros((1, 32, 32), dtype=jnp.uint8)
    c = jnp.zeros((1, 16, 16), dtype=jnp.uint8)
    with pytest.raises(ValueError, match="already"):
        jpeg_transform_batch((y, c, c), src_fmt=int(PixelFormat.YUV420),
                             width=32, height=32, quality=85,
                             subsample420=False)


def test_transform_batch_validates_declared_size():
    """width/height are the logical size the host writer declares; a
    plane shape that disagrees must error instead of the writer's edge
    clamping silently producing wrong edge blocks."""
    import jax.numpy as jnp

    from vali_tpu.core.enums import PixelFormat
    from vali_tpu.ops.jpeg import jpeg_transform_batch

    rgb = jnp.zeros((1, 16, 16 * 3), dtype=jnp.uint8)
    with pytest.raises(ValueError, match="does not match"):
        jpeg_transform_batch((rgb,), src_fmt=int(PixelFormat.RGB),
                             width=32, height=16, quality=85)
