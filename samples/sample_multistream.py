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


def main_with_jpeg(uri, n_streams):
    """Config-5 variant: batched preprocess + TPU-assisted JPEG encode."""
    import numpy as np

    import vali_tpu as vali
    from vali_tpu.engine.jpeg import jpeg_encode_device
    from vali_tpu.memory.surface import Surface

    pipe = MultiStreamPipeline([uri] * n_streams, dst_w=224, dst_h=224,
                               gpu_id=0)
    total_jpegs = 0
    t0 = time.perf_counter()
    for batch, ids in pipe:
        surfaces = [Surface.from_jax(batch[i], vali.PixelFormat.RGB)
                    for i in range(batch.shape[0])]
        blobs = jpeg_encode_device(surfaces, quality=85)
        total_jpegs += len(blobs)
    dt = time.perf_counter() - t0
    print(f"jpeg pipeline: {total_jpegs} JPEGs in {dt:.2f}s "
          f"= {total_jpegs / dt:.1f} jpeg/s (host entropy bound on this "
          f"machine's single core)")


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[3] == "jpeg":
        main_with_jpeg(sys.argv[1], int(sys.argv[2]))
    else:
        main()
