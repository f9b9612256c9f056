"""Memory-stability soak test (parity: reference
tests/test_MemUsagePyDecoder.py:52-139).

Decodes a file repeatedly, printing RSS (and device memory when
observable) every ~500 frames; pass criterion is no monotonic growth.
Run explicitly (not collected by pytest):

    python3 tests/soak_decode.py [iterations] [uri]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def synthesize_clip(path: str, w=848, h=464, n=96, fps=30.0) -> str:
    """Encode+mux a soak clip with our own encoder/muxer so the soak is
    self-contained when the reference checkout is absent (e.g. in the
    repo's own CI, which has no /root/reference). Canonical helper lives
    in vali_tpu.utils.synth (also used by the multichip dryrun)."""
    from vali_tpu.utils.synth import synthesize_clip as _synth

    return _synth(path, w=w, h=h, n=n, fps=fps)


def main():
    iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    uri = sys.argv[2] if len(sys.argv) > 2 else \
        "/root/reference/tests/data/test.mp4"
    if len(sys.argv) <= 2 and not os.path.exists(uri):
        import tempfile

        uri = synthesize_clip(
            os.path.join(tempfile.mkdtemp(prefix="vali_soak_"), "soak.mp4"))
        print(f"reference clip absent; synthesized own soak clip: {uri}")
    use_device = os.environ.get("SOAK_DEVICE", "0") == "1"
    # NOTE: under the axon TPU tunnel, the backend retains a host-side
    # mirror per device transfer, so SOAK_DEVICE=1 shows linear RSS growth
    # that is NOT a framework leak (the same loop is flat on the CPU
    # backend and on real PJRT TPU runtimes). The CPU path is the
    # leak-detection gate, matching the reference's CI usage.

    import vali_tpu as vali

    rss_samples = []
    frames_total = 0
    for it in range(iterations):
        dec = vali.PyDecoder(uri, {}, gpu_id=0 if use_device else -1)
        if use_device:
            surf = vali.Surface.Make(dec.Format, dec.Width, dec.Height,
                                     gpu_id=0)
            while dec.DecodeSingleSurface(surf)[0]:
                frames_total += 1
                if frames_total % 500 == 0:
                    print(f"frames={frames_total} rss={rss_mb():.1f} MB")
        else:
            frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
            while dec.DecodeSingleFrame(frame)[0]:
                frames_total += 1
                if frames_total % 500 == 0:
                    print(f"frames={frames_total} rss={rss_mb():.1f} MB")
        rss_samples.append(rss_mb())
        print(f"iteration {it + 1}/{iterations}: rss={rss_samples[-1]:.1f} MB")

    # pass criterion: last-iteration RSS within 10% + 20MB of the first
    if len(rss_samples) >= 2:
        limit = rss_samples[0] * 1.10 + 20.0
        if rss_samples[-1] > limit:
            print(f"FAIL: RSS grew from {rss_samples[0]:.1f} to "
                  f"{rss_samples[-1]:.1f} MB")
            sys.exit(1)
    print(f"OK: decoded {frames_total} frames, RSS stable "
          f"({rss_samples[0]:.1f} -> {rss_samples[-1]:.1f} MB)")


if __name__ == "__main__":
    main()
