"""Decode a clip to TPU surfaces and compute per-frame stats.

vali-tpu analogue of the reference's sample_decode_show.ipynb: decode
frames into HBM, convert to RGB on the TPU, consume as jax arrays.

Usage: python3 samples/sample_decode.py <video> [gpu_id]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import vali_tpu as vali  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    gpu_id = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    dec = vali.PyDecoder(uri, {}, gpu_id=gpu_id)
    print(f"{uri}: {dec.Width}x{dec.Height} {dec.Format.name} "
          f"{dec.Framerate} fps, {dec.NumFrames} frames, "
          f"{dec.ColorSpace.name}/{dec.ColorRange.name}")

    surf = vali.Surface.Make(dec.Format, dec.Width, dec.Height, gpu_id=gpu_id)
    rgb = vali.Surface.Make(vali.PixelFormat.RGB, dec.Width, dec.Height,
                            gpu_id=gpu_id)
    cvt = vali.PySurfaceConverter(gpu_id=gpu_id)
    # The YUV420->RGB pair supports BT_601 only (NPP dispatch parity;
    # the reference's GPU path sees NV12 where BT_709 exists).
    space = (dec.ColorSpace if dec.Format == vali.PixelFormat.NV12
             else vali.ColorSpace.BT_601)
    cc = vali.ColorspaceConversionContext(space, dec.ColorRange)

    pkt = vali.PacketData()
    n = 0
    while True:
        ok, info = dec.DecodeSingleSurface(surf, pkt)
        if not ok:
            break
        ok, info = cvt.Run(surf, rgb, cc)
        assert ok, info
        arr = rgb.to_jax()  # zero-copy: feed a model directly from here
        if n % 30 == 0:
            print(f"frame {n} pts={pkt.pts} "
                  f"mean RGB={float(arr.astype('float32').mean()):.1f}")
        n += 1
    print(f"decoded {n} frames")


if __name__ == "__main__":
    main()
