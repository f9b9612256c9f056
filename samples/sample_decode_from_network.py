"""Decode from a network/streaming source (parity:
sample_decode_from_network.ipynb).

Any FFmpeg-supported URL works (http(s), rtsp, rtmp, hls); the
timeout option guards against hung network I/O via the interrupt-callback
watchdog (reference Utils.cpp TimeoutHandler parity). For HLS ABR ladders,
``preferred_width`` selects the rendition.
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import vali_tpu as vali  # noqa: E402


def main():
    url = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"  # stand-in for a URL
    opts = {
        "timeout": "5000",          # ms; aborts hung network reads
        # "preferred_width": "1280",  # pick an HLS/ABR rendition
    }
    dec = vali.PyDecoder(url, opts, gpu_id=-1)
    print(f"{url}: {dec.Width}x{dec.Height} {dec.Format.name}")
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    n = 0
    while n < 60 and dec.DecodeSingleFrame(frame)[0]:
        n += 1
    print(f"decoded {n} frames")


if __name__ == "__main__":
    main()
