"""Detect shot boundaries in a clip with on-device analytics.

Decodes in batches, scores every frame transition on the accelerator
(blended SAD + histogram-L1, ops/analytics.py) and prints the detected
cuts plus per-shot exposure statistics. The whole scoring pass is three
reductions over data that is already in HBM — no per-frame host loop.

Usage: python3 samples/sample_scene_detection.py <video> [threshold]
"""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

import vali_tpu as vali  # noqa: E402
from vali_tpu.ops import analytics  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

    dec = vali.PyDecoder(uri, {}, gpu_id=-1)
    w, h = dec.Width, dec.Height
    print(f"{uri}: {w}x{h} {dec.Format.name}, {dec.NumFrames} frames")

    # luma plane is all the detector needs — skip the chroma copy.
    # Signal peak by format: P10/P12 planes are MSB-aligned uint16
    # (v16 = v10<<6, peak 65472); planar yuv420p10 is LSB (peak 1023).
    F = vali.PixelFormat
    if dec.Format in (F.P10, F.P12):
        dtype, peak = np.uint16, float(1023 << 6)
    elif dec.Format == F.YUV420_10bit:
        dtype, peak = np.uint16, 1023.0
    else:
        dtype, peak = np.uint8, 255.0
    frames = []
    buf = np.ndarray(dec.HostFrameSize, dtype=np.uint8)
    while True:
        ok, _ = dec.DecodeSingleFrame(buf)
        if not ok:
            break
        frames.append(buf.view(dtype)[:w * h].reshape(h, w).copy())
    clip = np.stack(frames)
    print(f"decoded {clip.shape[0]} luma planes")

    scores = np.asarray(analytics.scene_change_scores(clip, peak=peak))
    cuts = analytics.detect_scene_changes(clip, threshold=threshold,
                                          min_gap=3, peak=peak)
    print(f"max transition score {scores.max():.3f}, "
          f"median {np.median(scores):.3f}")
    print(f"cuts at frames: "
          f"{[int(c) for c in cuts] if len(cuts) else '(none)'}")

    # per-shot exposure stats
    bounds = [0, *cuts.tolist(), clip.shape[0]]
    stats = analytics.luma_stats_batch(clip)
    mean = np.asarray(stats["mean"])
    for a, b in zip(bounds[:-1], bounds[1:]):
        print(f"shot [{a}:{b}): mean luma {mean[a:b].mean():.1f}")
    print("OK")


if __name__ == "__main__":
    main()
