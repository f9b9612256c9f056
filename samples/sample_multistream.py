"""The north-star pipeline: N concurrent streams -> batched fused TPU
preprocess (BASELINE.json config 5)."""

import sys
import time

sys.path.insert(0, ".")

from vali_tpu.pipeline.multistream import MultiStreamPipeline  # noqa: E402


def main():
    uri = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/tests/data/test.mp4"
    n_streams = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    pipe = MultiStreamPipeline([uri] * n_streams, dst_w=224, dst_h=224,
                               gpu_id=0)
    t0 = time.perf_counter()
    frames = 0
    last = None
    for batch, ids in pipe:
        frames += batch.shape[0]
        last = batch
    if last is not None:
        last.block_until_ready()
    dt = time.perf_counter() - t0
    print(f"{n_streams} streams: {frames} frames in {dt:.2f}s "
          f"= {frames / dt:.1f} fps end-to-end "
          f"(host decode bound on this machine's core count)")


if __name__ == "__main__":
    main()
