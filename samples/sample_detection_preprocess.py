"""Detection-serving preprocess: letterbox N streams to a fixed square
model input (YOLO convention — aspect-preserving resize, centered gray-114
canvas), with the geometry needed to map boxes back to source pixels.

Usage: sample_detection_preprocess.py [uri] [n_streams] [input_size]
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402

from vali_tpu.ops.fused import letterbox_params  # noqa: E402
from vali_tpu.pipeline.multistream import MultiStreamPipeline  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    dst = int(sys.argv[3]) if len(sys.argv) > 3 else 640

    pipe = MultiStreamPipeline([uri] * n_streams, dst_w=dst, dst_h=dst,
                               gpu_id=0, letterbox=True)
    iw, ih, left, top, scale = letterbox_params(pipe.src_w, pipe.src_h,
                                                dst, dst)
    print(f"source {pipe.src_w}x{pipe.src_h} -> content {iw}x{ih} at "
          f"(+{left},+{top}), scale {scale:.4f}")

    frames = 0
    t0 = time.perf_counter()
    pad_checked = False
    for batch, ids in pipe:
        frames += batch.shape[0]
        if not pad_checked:
            arr = np.asarray(batch[0])
            bar = arr[:top] if top else arr[:, :left]
            assert (bar == 114).all(), "letterbox bars must be gray 114"
            pad_checked = True
            # a detector's xyxy output maps back with:
            #   src_xy = (box_xy - (left, top)) / scale
    dt = time.perf_counter() - t0
    print(f"letterboxed {frames} frames to {dst}x{dst} in {dt:.2f}s "
          f"= {frames / dt:.1f} fps")


if __name__ == "__main__":
    main()
