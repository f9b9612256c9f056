"""Seek sample (parity: reference sample_seek.ipynb): random access into a
clip by frame number and by timestamp."""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import vali_tpu as vali  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    dec = vali.PyDecoder(uri, {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    pkt = vali.PacketData()

    for target in (40, 10, 80):
        ok, info = dec.DecodeSingleFrame(
            frame, pkt, seek_ctx=vali.SeekContext(seek_frame=target))
        landed = round(pkt.pts * dec.Timebase * dec.Framerate)
        print(f"seek frame {target}: landed on {landed} "
              f"(pts={pkt.pts}, key={pkt.key})")

    ok, info = dec.DecodeSingleFrame(
        frame, pkt, seek_ctx=vali.SeekContext(seek_ts=1.5))
    print(f"seek 1.5s: pts={pkt.pts} -> {pkt.pts * dec.Timebase:.3f}s")


if __name__ == "__main__":
    main()
