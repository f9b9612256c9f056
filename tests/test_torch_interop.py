"""Zero-copy torch interop via DLPack — the reference's signature
feature (test_PySurface.py Surface<->torch round trips). On the CPU test
backend jax arrays export as kDLCPU, so torch (CPU build) consumes them
directly; on TPU the same API hands frames to JAX models instead."""

import numpy as np
import pytest

import vali_tpu as vali

torch = pytest.importorskip("torch")

W, H = 320, 240
RNG = np.random.default_rng(5)


def test_surface_to_torch_from_dlpack():
    rgb = RNG.integers(0, 255, (H, W, 3), dtype=np.uint8)
    surf = vali.Surface.from_numpy(rgb, vali.PixelFormat.RGB)
    t = torch.from_dlpack(surf)
    assert t.dtype == torch.uint8
    assert np.array_equal(t.numpy().reshape(H, W, 3), rgb)


def test_torch_to_surface_from_dlpack():
    t = torch.randint(0, 255, (H, W * 3), dtype=torch.uint8)
    surf = vali.Surface.from_dlpack(t, vali.PixelFormat.RGB)
    assert (surf.Width, surf.Height) == (W, H)
    assert np.array_equal(surf.to_numpy().reshape(H, W * 3), t.numpy())


def test_decode_convert_feed_torch_model():
    """Decode -> device convert -> DLPack -> a torch module end-to-end
    (reference: decode -> DLPack -> torchvision, test_TorchSegmentation)."""
    import os

    gt = "/root/reference/tests/data/test.mp4"
    if not os.path.exists(gt):
        pytest.skip("no reference data")
    dec = vali.PyDecoder(gt, {}, gpu_id=0)
    surf = vali.Surface.Make(dec.Format, dec.Width, dec.Height, gpu_id=0)
    ok, _ = dec.DecodeSingleSurface(surf)
    assert ok
    rgb = vali.Surface.Make(vali.PixelFormat.RGB, dec.Width, dec.Height)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    # YUV420->RGB supports BT_601 only (NPP-parity quirk,
    # TaskConvertSurface.cpp pair table)
    assert cvt.Run(surf, rgb, vali.ColorspaceConversionContext(
        vali.ColorSpace.BT_601, vali.ColorRange.MPEG))[0]
    t = torch.from_dlpack(rgb).reshape(dec.Height, dec.Width, 3)
    x = t.permute(2, 0, 1).unsqueeze(0).float() / 255.0
    conv = torch.nn.Conv2d(3, 4, 3, stride=2)
    with torch.no_grad():
        y = conv(x)
    assert y.shape[1] == 4 and torch.isfinite(y).all()
