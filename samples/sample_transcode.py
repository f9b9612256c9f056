"""Transcode: decode -> resize -> NV12 repack -> encode -> mux.

vali-tpu analogue of the reference's sample_transcode.ipynb (the
BASELINE.md config-3 path): all pixel work runs on the TPU, encode on
host. Output ending in .mp4/.mkv/.ts is muxed with timestamps (PyMuxer —
beyond the reference, which emits raw elementary streams only);
.h264/.h265 writes the raw stream.

Usage: python3 samples/sample_transcode.py <in> <out.mp4> [width height]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import vali_tpu as vali  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/transcoded.h264"
    dst_w = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    dst_h = int(sys.argv[4]) if len(sys.argv) > 4 else 360

    dec = vali.PyDecoder(uri, {}, gpu_id=0)
    cc = vali.ColorspaceConversionContext(dec.ColorSpace, dec.ColorRange)

    src = vali.Surface.Make(dec.Format, dec.Width, dec.Height, gpu_id=0)
    resized = vali.Surface.Make(dec.Format, dst_w, dst_h, gpu_id=0)
    # turbo: the banded Pallas resize kernel (~9x the dense path at 4K)
    resizer = vali.PySurfaceResizer(dec.Format, gpu_id=0, turbo=True)
    # YUV420 -> NV12 repack for the encoder
    nv12 = vali.Surface.Make(vali.PixelFormat.NV12, dst_w, dst_h, gpu_id=0)
    cvt = vali.PySurfaceConverter(gpu_id=0)

    # bf=0 keeps packet order == display order so the mux step below can
    # assign sequential timestamps without parsing the bitstream
    enc = vali.PyNvEncoder(
        {"s": f"{dst_w}x{dst_h}", "bitrate": "2M", "bf": "0",
         "fps": str(int(dec.Framerate) or 30), "preset": "P4"},
        gpu_id=0, format=vali.PixelFormat.NV12)

    packet = np.zeros(0, dtype=np.uint8)
    chunks = []
    n = 0
    while True:
        ok, info = dec.DecodeSingleSurface(src)
        if not ok:
            break
        assert resizer.Run(src, resized)[0]
        assert cvt.Run(resized, nv12)[0]
        if enc.EncodeSingleSurface(nv12, packet) and packet.size:
            chunks.append(packet.tobytes())
        n += 1
    while True:
        flush = np.zeros(0, dtype=np.uint8)
        if not enc.FlushSinglePacket(flush) or not flush.size:
            break
        chunks.append(flush.tobytes())

    fps = float(dec.Framerate) or 30.0
    if out_path.endswith((".mp4", ".mkv", ".ts")):
        from vali_tpu.engine.muxer import PyMuxer

        with PyMuxer(out_path, dst_w, dst_h, fps=fps) as mux:
            for i, pkt in enumerate(chunks):
                ok, info = mux.Mux(pkt, pts=i / fps)
                assert ok, info
    else:
        with open(out_path, "wb") as f:
            f.write(b"".join(chunks))
    print(f"transcoded {n} frames -> {out_path} "
          f"({sum(len(c) for c in chunks)} bytes)")


if __name__ == "__main__":
    main()
