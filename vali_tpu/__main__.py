"""Command-line utility: ``python -m vali_tpu <command> ...``

Commands:
  probe <url>                       stream parameters
  decode <url> [n]                  decode n frames, print stats
  transcode <in> <out.h264> [WxH]   decode -> resize -> encode
  bench                             run the headline benchmark
"""

import sys

import numpy as np


def cmd_probe(args):
    import vali_tpu as vali

    for i, sp in enumerate(vali.PyDecoder.Probe(args[0])):
        print(f"stream {i}: {sp.width}x{sp.height} codec_id={sp.codec_id} "
              f"{sp.fps} fps, {sp.num_frames} frames, "
              f"{sp.color_space.name}/{sp.color_range.name}, "
              f"profile={sp.profile} level={sp.level} "
              f"bitrate={sp.bit_rate}")


def cmd_decode(args):
    import time

    import vali_tpu as vali

    url = args[0]
    limit = int(args[1]) if len(args) > 1 else 0
    dec = vali.PyDecoder(url, {}, gpu_id=-1)
    print(f"{url}: {dec.Width}x{dec.Height} {dec.Format.name} "
          f"{dec.Framerate} fps {dec.ColorSpace.name}/{dec.ColorRange.name}")
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    n = 0
    t0 = time.perf_counter()
    while dec.DecodeSingleFrame(frame)[0]:
        n += 1
        if limit and n >= limit:
            break
    dt = time.perf_counter() - t0
    print(f"decoded {n} frames in {dt:.2f}s = {n / dt:.1f} fps; "
          f"stats={dec.Stats}")


def cmd_transcode(args):
    import vali_tpu as vali

    src_url, out_path = args[0], args[1]
    if len(args) > 2:
        w, h = (int(v) for v in args[2].split("x"))
    else:
        w = h = None
    dec = vali.PyDecoder(src_url, {}, gpu_id=0)
    w = w or dec.Width
    h = h or dec.Height
    rsz = vali.PySurfaceResizer(dec.Format, gpu_id=0, turbo=True)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    enc = vali.PyNvEncoder({"s": f"{w}x{h}", "bitrate": "4M"}, gpu_id=0,
                           format=vali.PixelFormat.NV12)
    src = vali.Surface.Make(dec.Format, dec.Width, dec.Height, gpu_id=0)
    small = vali.Surface.Make(dec.Format, w, h, gpu_id=0)
    nv12 = vali.Surface.Make(vali.PixelFormat.NV12, w, h, gpu_id=0)
    pkt = np.zeros(0, dtype=np.uint8)
    chunks = []
    n = 0
    while dec.DecodeSingleSurface(src)[0]:
        assert rsz.Run(src, small)[0]
        if dec.Format != vali.PixelFormat.NV12:
            assert cvt.Run(small, nv12)[0]
            target = nv12
        else:
            target = small
        if enc.EncodeSingleSurface(target, pkt) and pkt.size:
            chunks.append(pkt.tobytes())
        n += 1
    flush = np.zeros(0, dtype=np.uint8)
    if enc.Flush(flush) and flush.size:
        chunks.append(flush.tobytes())
    with open(out_path, "wb") as f:
        f.write(b"".join(chunks))
    print(f"transcoded {n} frames -> {out_path}")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    cmd, args = sys.argv[1], sys.argv[2:]
    if cmd == "probe":
        cmd_probe(args)
    elif cmd == "decode":
        cmd_decode(args)
    elif cmd == "transcode":
        cmd_transcode(args)
    elif cmd == "bench":
        import bench

        bench.main()
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
