"""Batch JPEG encode of decoded frames (PyNvJpegEncoder analogue)."""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import vali_tpu as vali  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    count = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    dec = vali.PyDecoder(uri, {}, gpu_id=0)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    # The YUV420->RGB pair supports BT_601 only (NPP dispatch parity;
    # the reference's GPU path sees NV12 where BT_709 exists).
    space = (dec.ColorSpace if dec.Format == vali.PixelFormat.NV12
             else vali.ColorSpace.BT_601)
    cc = vali.ColorspaceConversionContext(space, dec.ColorRange)
    jpeg = vali.PyNvJpegEncoder(gpu_id=0)
    ctx = jpeg.Context(90, vali.PixelFormat.RGB)

    surfaces = []
    src = vali.Surface.Make(dec.Format, dec.Width, dec.Height, gpu_id=0)
    for _ in range(count):
        ok, _ = dec.DecodeSingleSurface(src)
        if not ok:
            break
        rgb = vali.Surface.Make(vali.PixelFormat.RGB, dec.Width, dec.Height,
                                gpu_id=0)
        assert cvt.Run(src, rgb, cc)[0]
        surfaces.append(rgb)

    blobs, info = jpeg.Run(ctx, surfaces)
    assert info == vali.TaskExecInfo.SUCCESS
    for i, blob in enumerate(blobs):
        path = f"/tmp/frame_{i}.jpg"
        blob.tofile(path)
        print(f"{path}: {blob.size} bytes")


if __name__ == "__main__":
    main()
