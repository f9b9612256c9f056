"""Capture a TPU profiler trace of the fused preprocess (NVTX-analogue
demo: every vali op runs inside jax.profiler.TraceAnnotation scopes, so
kernels show up named in the trace)."""

import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
    from vali_tpu.pipeline.multistream import preprocess_batch

    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vali_trace"
    B, H, W = 8, 464, 848
    rng = np.random.default_rng(0)
    nv12 = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W),
                                    dtype=np.uint8))
    # warm up (compile outside the trace)
    preprocess_batch((nv12,), PixelFormat.NV12, W, H, 224, 224,
                     ColorSpace.BT_709,
                     ColorRange.MPEG).block_until_ready()
    with jax.profiler.trace(out_dir):
        for _ in range(4):
            preprocess_batch((nv12,), PixelFormat.NV12, W, H, 224, 224,
                             ColorSpace.BT_709,
                             ColorRange.MPEG).block_until_ready()
    print(f"trace written to {out_dir} (view with TensorBoard/Perfetto)")


if __name__ == "__main__":
    main()
