"""HDR -> SDR transcode: 10-bit decode, on-device tone map, H.264 encode.

Synthesizes a PQ-coded BT.2020 10-bit clip when no input is given (the
reference test data has no HDR stream), then runs the full production
path: decode yuv420p10 -> BT.2020 YCbCr->RGB at float precision ->
BT.2390 tone map to 100-nit SDR on the accelerator -> encode the SDR
result back to H.264.

Usage: python3 samples/sample_hdr_tonemap.py [hdr_video] [out.h264]
"""

import sys
import tempfile

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import vali_tpu as vali  # noqa: E402
from vali_tpu.ops import tonemap  # noqa: E402


def synthesize_hdr_clip(path, w=320, h=192, n=12):
    """PQ-coded test pattern: dim scene + bright moving highlight."""
    enc = vali.PyNvEncoder({"s": f"{w}x{h}", "codec": "h264",
                            "constqp": "12"}, gpu_id=-1,
                           format=vali.PixelFormat.YUV420_10bit)
    chunks = []
    for i in range(n):
        y10 = np.full((h, w), 280, dtype=np.uint16)  # ~4 nits background
        x0 = 16 + 12 * i
        y10[40:88, x0:x0 + 48] = 820                  # ~2000 nits highlight
        u10 = np.full((h // 2, w // 2), 512, dtype=np.uint16)
        v10 = np.full((h // 2, w // 2), 512, dtype=np.uint16)
        frame = np.concatenate(
            [y10.ravel(), u10.ravel(), v10.ravel()]).view(np.uint8)
        pkt = np.ndarray(0, dtype=np.uint8)
        if enc.EncodeSingleFrame(frame, pkt):
            chunks.append(bytes(pkt))
    pkt = np.ndarray(0, dtype=np.uint8)
    while enc.FlushSinglePacket(pkt):
        chunks.append(bytes(pkt))
        pkt = np.ndarray(0, dtype=np.uint8)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))
    return path


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else synthesize_hdr_clip(
        tempfile.mktemp(suffix=".h264"))
    out_path = sys.argv[2] if len(sys.argv) > 2 else \
        tempfile.mktemp(suffix=".h264")

    dec = vali.PyDecoder(uri, {}, gpu_id=-1)
    w, h = dec.Width, dec.Height
    print(f"{uri}: {w}x{h} {dec.Format.name}")
    if dec.Format != vali.PixelFormat.YUV420_10bit:
        raise SystemExit("expected a yuv420p10 HDR stream")

    ys, us, vs = [], [], []
    buf = np.ndarray(dec.HostFrameSize, dtype=np.uint8)
    while True:
        ok, _ = dec.DecodeSingleFrame(buf)
        if not ok:
            break
        u16 = buf.view(np.uint16)
        cw, ch = w // 2, h // 2
        ys.append(u16[:w * h].reshape(h, w).copy())
        us.append(u16[w * h:w * h + cw * ch].reshape(ch, cw).copy())
        vs.append(u16[w * h + cw * ch:].reshape(ch, cw).copy())
    n = len(ys)
    print(f"decoded {n} HDR frames")

    # nearest-neighbor chroma upsample, then the on-device HDR pipeline
    up = lambda p: np.repeat(np.repeat(np.stack(p), 2, 1), 2, 2)  # noqa: E731
    rgb = tonemap.bt2020_yuv_to_rgb(np.stack(ys), up(us), up(vs),
                                    bit_depth=10)
    sdr = np.asarray(tonemap.tonemap_batch(
        rgb, transfer="pq", peak_nits=1000.0, target_nits=100.0,
        method="bt2390"))
    print(f"tone-mapped to SDR: {sdr.shape} {sdr.dtype}, "
          f"luma range [{sdr.min()}, {sdr.max()}]")

    # encode the SDR result (RGB -> YUV420 -> H.264; the RGB->YUV420
    # converter pair carries BT_601 like the reference's NPP dispatch)
    enc = vali.PyNvEncoder({"s": f"{w}x{h}", "codec": "h264",
                            "bitrate": "3M"}, gpu_id=-1,
                           format=vali.PixelFormat.YUV420)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_601,
                                          vali.ColorRange.MPEG)
    chunks = []
    for i in range(n):
        rgb_surf = vali.Surface.from_numpy(
            np.ascontiguousarray(sdr[i]).reshape(h, w * 3),
            vali.PixelFormat.RGB, width=w, height=h, gpu_id=0)
        yuv = vali.Surface.Make(vali.PixelFormat.YUV420, w, h, gpu_id=0)
        ok, info = cvt.Run(rgb_surf, yuv, cc)
        assert ok, info
        pkt = np.ndarray(0, dtype=np.uint8)
        if enc.EncodeSingleFrame(yuv.to_numpy().reshape(-1), pkt):
            chunks.append(bytes(pkt))
    pkt = np.ndarray(0, dtype=np.uint8)
    while enc.FlushSinglePacket(pkt):
        chunks.append(bytes(pkt))
        pkt = np.ndarray(0, dtype=np.uint8)
    with open(out_path, "wb") as f:
        f.write(b"".join(chunks))
    print(f"wrote SDR stream: {out_path} ({sum(map(len, chunks))} bytes)")
    print("OK")


if __name__ == "__main__":
    main()
