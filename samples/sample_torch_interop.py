"""Zero-copy tensor interop: decoded Surfaces -> torch / jax via DLPack.

vali-tpu analogue of the reference's sample_pycuda.ipynb (hand a decoded
GPU frame to a third-party tensor library without a host copy). Here the
consumers are torch (CPU build in this image) and jax; the DLPack
protocol is the same one the reference exports through
Surface.__dlpack__ (PySurface.cpp:372-435).

Usage: python3 samples/sample_torch_interop.py <video> [n_frames]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import vali_tpu as vali  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    try:
        import torch
    except ImportError:
        print("torch not available; exiting")
        return

    dec = vali.PyDecoder(uri, {}, gpu_id=0)
    surf = vali.Surface.Make(dec.Format, dec.Width, dec.Height, gpu_id=0)
    rgb = vali.Surface.Make(vali.PixelFormat.RGB, dec.Width, dec.Height)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    # YUV420->RGB is a BT_601-only pair (NPP-parity quirk); NV12 input
    # follows the stream's own colorspace.
    space = (dec.ColorSpace if dec.Format == vali.PixelFormat.NV12
             else vali.ColorSpace.BT_601)
    cc = vali.ColorspaceConversionContext(space, dec.ColorRange)

    conv = torch.nn.Conv2d(3, 8, 3, stride=4)
    for i in range(n_frames):
        ok, info = dec.DecodeSingleSurface(surf)
        if not ok:
            break
        ok, _ = cvt.Run(surf, rgb, cc)
        assert ok

        # Surface -> torch, zero-copy via __dlpack__
        t = torch.from_dlpack(rgb).reshape(dec.Height, dec.Width, 3)
        x = t.permute(2, 0, 1).unsqueeze(0).float() / 255.0
        with torch.no_grad():
            feat = conv(x)
        print(f"frame {i}: torch {tuple(t.shape)} -> conv "
              f"{tuple(feat.shape)} mean={feat.mean().item():+.4f}")

    # torch -> Surface (the reverse direction: wrap foreign memory)
    t = torch.randint(0, 255, (dec.Height, dec.Width * 3),
                      dtype=torch.uint8)
    back = vali.Surface.from_dlpack(t, vali.PixelFormat.RGB)
    assert np.array_equal(back.to_numpy().reshape(t.shape), t.numpy())
    print(f"torch -> Surface round trip OK "
          f"({back.Width}x{back.Height} {back.Format.name})")


if __name__ == "__main__":
    main()
