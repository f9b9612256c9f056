"""Report all five BASELINE.md benchmark configs (one JSON line each).

The driver's canonical headline stays in bench.py; this script covers the
full config list for completeness:

  1. PyDecoder software decode + CPU frame convert -> RGB
  2. Batched TPU convert+resize (NV12 -> RGB_PLANAR, 1080p -> 224x224)
  3. Full transcode: decode -> resize -> rotate -> NV12 repack -> encode
  4. Decode -> fused preprocess -> FCN segmentation inference (e2e)
  5. Multi-stream pipeline + JPEG encode (device DCT + host entropy)

Caveats on this environment (single host core + tunneled TPU):
  - configs 3-5 run one device op per frame; each op costs ~35 ms of
    tunnel RPC latency, so their wall-clock here reflects the tunnel, not
    the chip or the framework (on locally-attached TPUs they are
    host-decode/encode/entropy bound instead).
  - config 2 measures the UNFUSED two-stage path (full-resolution RGB
    intermediates in HBM); compare with bench.py's fused kernel at the
    same shapes — the fused path is ~100x faster, which is the point of
    the fused/Pallas design.
  - config 1 scales linearly with host cores.
"""

import json
import time

import numpy as np

CLIP = "/root/reference/tests/data/test.mp4"


def emit(name, value, unit, **extra):
    print(json.dumps({"config": name, "value": round(value, 1),
                      "unit": unit, **extra}))


def config1_decode_convert_cpu():
    import vali_tpu as vali

    dec = vali.PyDecoder(CLIP, {}, gpu_id=-1)
    conv = vali.PyFrameConverter(dec.Width, dec.Height, dec.Format,
                                 vali.PixelFormat.RGB)
    cc = vali.ColorspaceConversionContext(vali.ColorSpace.BT_601,
                                          vali.ColorRange.MPEG)
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    rgb = np.zeros(dec.Width * dec.Height * 3, dtype=np.uint8)
    n = 0
    t0 = time.perf_counter()
    while dec.DecodeSingleFrame(frame)[0]:
        ok, _ = conv.Run(frame, rgb, cc)
        assert ok
        n += 1
    fps = n / (time.perf_counter() - t0)
    emit("1. sw decode + CPU NV12->RGB convert", fps, "frames/sec/core",
         frames=n)


def _slope_time(fn, arg, K_short=8, K_long=40, reps=4):
    import jax
    import jax.numpy as jnp

    def make(K):
        @jax.jit
        def run(x):
            def body(k, carry):
                acc, xx = carry
                patch = (k % 199 + 1).astype(jnp.uint8).reshape(
                    *([1] * xx.ndim))
                xx = jax.lax.dynamic_update_slice(
                    xx, patch, (0,) * xx.ndim)
                out = fn(xx)
                return (acc + jnp.sum(out[1].astype(jnp.int32))
                        if isinstance(out, tuple)
                        else acc + jnp.sum(out.astype(jnp.int32)), xx)
            acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), x))
            return acc
        return run

    times = {}
    for K in (K_short, K_long):
        r = make(K)
        float(r(arg))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(r(arg))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
    return (times[K_long] - times[K_short]) / (K_long - K_short)


def config2_convert_resize_tpu():
    import jax.numpy as jnp

    from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
    from vali_tpu.ops import csc, resize

    B, H, W = 64, 1080, 1920
    rng = np.random.default_rng(0)
    nv12 = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W),
                                    dtype=np.uint8))
    cc = None

    def two_stage(x):
        from vali_tpu.core.details import ColorspaceConversionContext

        rgbp = csc.convert_batch(
            (x,), PixelFormat.NV12, PixelFormat.RGB, W, H,
            ColorspaceConversionContext(ColorSpace.BT_709, ColorRange.MPEG))
        small = resize.resize_batch(rgbp, PixelFormat.RGB, W, H, 224, 224,
                                    method="lanczos_aa")
        return small[0]

    per_batch = _slope_time(two_stage, nv12)
    emit("2. TPU batched convert+resize (two-stage, 64x1080p->224)",
         B / per_batch, "frames/sec/chip",
         ms_per_batch=round(per_batch * 1000, 3))


def config3_full_transcode():
    import vali_tpu as vali

    dec = vali.PyDecoder(CLIP, {}, gpu_id=0)
    rsz = vali.PySurfaceResizer(dec.Format, gpu_id=0)
    rot = vali.PySurfaceRotator(gpu_id=0)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    enc = vali.PyNvEncoder({"s": "640x360", "bitrate": "2M"}, gpu_id=0,
                           format=vali.PixelFormat.NV12)
    src = vali.Surface.Make(dec.Format, dec.Width, dec.Height, gpu_id=0)
    small = vali.Surface.Make(dec.Format, 640, 360, gpu_id=0)
    rotd = vali.Surface.Make(dec.Format, 640, 360, gpu_id=0)
    nv12 = vali.Surface.Make(vali.PixelFormat.NV12, 640, 360, gpu_id=0)
    pkt = np.zeros(0, dtype=np.uint8)
    n = 0
    t0 = time.perf_counter()
    while dec.DecodeSingleSurface(src)[0]:
        assert rsz.Run(src, small)[0]
        assert rot.Run(small, rotd, 180.0)[0]
        assert cvt.Run(rotd, nv12)[0]
        enc.EncodeSingleSurface(nv12, pkt)
        n += 1
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    fps = n / (time.perf_counter() - t0)
    emit("3. full transcode decode->resize->rotate->NV12->encode", fps,
         "frames/sec (host decode+encode bound)", frames=n)


def config4_inference_e2e():
    import jax
    import jax.numpy as jnp

    from vali_tpu.models import fcn
    from vali_tpu.pipeline.multistream import MultiStreamPipeline

    params = fcn.init_params(jax.random.PRNGKey(0))
    infer = jax.jit(fcn.predict_classes)
    pipe = MultiStreamPipeline([CLIP], dst_w=224, dst_h=224, gpu_id=0,
                               out_dtype=jnp.float32)
    n = 0
    last = None
    t0 = time.perf_counter()
    for batch, ids in pipe:
        last = infer(params, batch)
        n += batch.shape[0]
    np.asarray(last)
    fps = n / (time.perf_counter() - t0)
    emit("4. decode -> fused preprocess -> FCN inference e2e", fps,
         "frames/sec (host decode bound)", frames=n)


def config5_pipeline_jpeg():
    import vali_tpu as vali
    from vali_tpu.engine.jpeg import jpeg_encode_device
    from vali_tpu.memory.surface import Surface
    from vali_tpu.pipeline.multistream import MultiStreamPipeline

    pipe = MultiStreamPipeline([CLIP] * 4, dst_w=224, dst_h=224, gpu_id=0)
    n = 0
    t0 = time.perf_counter()
    for batch, ids in pipe:
        surfaces = [Surface.from_jax(batch[i], vali.PixelFormat.RGB)
                    for i in range(batch.shape[0])]
        blobs = jpeg_encode_device(surfaces, quality=85)
        n += len(blobs)
    fps = n / (time.perf_counter() - t0)
    emit("5. multi-stream pipeline + JPEG (TPU DCT, host entropy)", fps,
         "jpeg/sec (host entropy bound)", jpegs=n)


# Measured 2026-08-16 (v5e + tunnel, single host core):
#   1: 399 frames/sec/core
#   2: 1558 frames/sec/chip (41 ms/batch unfused; fused kernel: 0.41 ms)
#   3: 2.0 frames/sec   (tunnel RTT x 4 ops/frame)
#   4: 15.8 frames/sec  (tunnel RTT bound)
#   5: 15.5 jpeg/sec    (tunnel RTT + 1-core entropy bound)

if __name__ == "__main__":
    config1_decode_convert_cpu()
    config2_convert_resize_tpu()
    config3_full_transcode()
    config4_inference_e2e()
    config5_pipeline_jpeg()
