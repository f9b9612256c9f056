"""The five BASELINE.md benchmark configs (callable; bench.py embeds the
results in its single JSON line, or run this file for one line per config).

  1. PyDecoder software decode + CPU frame convert -> RGB
  2. Batched TPU convert+resize, UNFUSED two-stage (NV12 -> RGB @1080p in
     HBM, then resize) — the contrast case for the fused kernel
  3. Full transcode: 4K HEVC decode -> resize -> rotate -> NV12 -> encode
     (the sample_transcode path; 4K source synthesized with our encoder)
  4. Decode -> fused preprocess -> FCN segmentation inference e2e
  5. 64 concurrent 1080p streams through MultiStreamPipeline
     (decode -> stage -> H2D -> batched Pallas kernel) + JPEG encode rate

Caveats on this environment (single host core + tunneled TPU): configs
3-5 are host-decode / tunnel-RTT bound — each per-frame device op costs
~35 ms of RPC latency here, which locally-attached TPUs don't pay. The
chip-side ceiling is bench.py's fused-kernel headline.
"""

import json
import os
import tempfile
import time

import numpy as np

CLIP = "/root/reference/tests/data/test.mp4"
CLIP_1080 = "/root/reference/tests/data/pts_test_video.mkv"

_synth_cache = {}


def _clip_or_synth(ref_path, w, h, n):
    """Use the reference fixture when the checkout exists; otherwise
    synthesize an equivalent clip with our own encoder+muxer (cached per
    process) so the bench is self-contained on a clean machine."""
    if os.path.exists(ref_path):
        return ref_path
    key = (w, h, n)
    if key not in _synth_cache:
        from vali_tpu.utils.synth import synthesize_clip

        _synth_cache[key] = synthesize_clip(
            os.path.join(tempfile.mkdtemp(prefix="vali_bench_"),
                         f"bench_{w}x{h}.mp4"), w=w, h=h, n=n)
    return _synth_cache[key]


def clip_848():
    return _clip_or_synth(CLIP, 848, 464, 96)


def clip_1080():
    return _clip_or_synth(CLIP_1080, 1920, 1080, 48)


def config1_decode_convert_cpu():
    import vali_tpu as vali

    dec = vali.PyDecoder(clip_848(), {}, gpu_id=-1)
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
    return {"value": round(fps, 1), "unit": "frames/sec/core", "frames": n}


def _slope_time(fn, arg, K_short=8, K_long=24, reps=3, on_short=None):
    """Two-point-slope per-call time, loop overhead subtracted.

    Mirrors bench.py's _time_kernel: the fori_loop's per-iteration
    perturbation (1-byte dynamic_update_slice + scalar accumulate,
    ~0.03 ms through this tunnel) is measured by a kernel-free baseline
    pass at the same chain lengths and subtracted — without it the
    reported slope overstates sub-0.1ms kernels (the device JPEG stage)
    by up to ~2x. As in bench.py, the baseline shares the kernel chain's
    compiled program via a traced apply_kernel bool (lax.cond), and the
    chain length K is a traced fori_loop bound (lowers to a while loop
    XLA cannot unroll), so the WHOLE measure — both chain lengths, both
    baselines — costs ONE remote compile. History: r4's 4-program
    schedule blew the budget; the r5 cond-fold halved it; the r5 f32
    compute defaults then roughly doubled big-shape Mosaic compile
    times (417s observed for the 1080p f32 convert) and the K-fold
    halves the count again.

    ``on_short(per_call_estimate)``: provisional single-chain estimate
    ((t_kernel - t_baseline)/K — the tunnel RTT cancels) delivered after
    the short chain, before the long-chain measurement."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, K, apply_kernel):
        def body(k, carry):
            acc, xx = carry
            patch = (k % 199 + 1).astype(jnp.uint8).reshape(
                *([1] * xx.ndim))
            xx = jax.lax.dynamic_update_slice(
                xx, patch, (0,) * xx.ndim)

            def with_kernel(v):
                out = fn(v)
                return (jnp.sum(out[1].astype(jnp.int32))
                        if isinstance(out, tuple)
                        else jnp.sum(out.astype(jnp.int32)))

            acc = acc + jax.lax.cond(
                apply_kernel, with_kernel,
                lambda v: v[(0,) * v.ndim].astype(jnp.int32), xx)
            return (acc, xx)
        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), x))
        return acc

    TRUE = jnp.asarray(True)
    FALSE = jnp.asarray(False)
    times, tbase = {}, {}
    base_reps = max(2, reps - 1)
    first = True
    for K in (K_short, K_long):
        Kj = jnp.int32(K)
        if first:  # the ONLY remote compile; warm both cond branches
            float(run(arg, Kj, TRUE))
            float(run(arg, Kj, FALSE))
            first = False
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(arg, Kj, TRUE))
            best = min(best, time.perf_counter() - t0)
        times[K] = best
        best = float("inf")
        for _ in range(base_reps):
            t0 = time.perf_counter()
            float(run(arg, Kj, FALSE))
            best = min(best, time.perf_counter() - t0)
        tbase[K] = best
        if K == K_short and on_short is not None:
            on_short(max((times[K] - tbase[K]) / K, 1e-9))
    dk = K_long - K_short
    with_kernel = (times[K_long] - times[K_short]) / dk
    baseline = (tbase[K_long] - tbase[K_short]) / dk
    return max(with_kernel - baseline, 1e-9)


def config2_convert_resize_tpu():
    import jax.numpy as jnp

    from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
    from vali_tpu.ops import csc, resize

    B, H, W = 64, 1080, 1920
    rng = np.random.default_rng(0)
    nv12 = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W),
                                    dtype=np.uint8))

    def two_stage(x):
        from vali_tpu.core.details import ColorspaceConversionContext

        rgbp = csc.convert_batch(
            (x,), PixelFormat.NV12, PixelFormat.RGB, W, H,
            ColorspaceConversionContext(ColorSpace.BT_709, ColorRange.MPEG))
        small = resize.resize_batch(rgbp, PixelFormat.RGB, W, H, 224, 224,
                                    method="lanczos_aa")
        return small[0]

    # long chains: at ~2.4 ms/batch the default K=8/24 slope delta
    # (~38 ms) is comparable to tunnel jitter and wobbled the reported
    # fps by +-8% between runs; K=16/80 gives a ~154 ms delta
    per_batch = _slope_time(two_stage, nv12, K_short=16, K_long=80)
    return {"value": round(B / per_batch, 1), "unit": "frames/sec/chip",
            "ms_per_batch": round(per_batch * 1000, 3),
            "note": "unfused two-stage; fused kernel is the headline"}


def _synthesize_4k_hevc(path, n_frames=6):
    import vali_tpu as vali
    from vali_tpu.memory.host import planes_to_host_frame

    W4, H4 = 3840, 2160
    enc = vali.PyNvEncoder(
        {"s": f"{W4}x{H4}", "codec": "hevc", "preset": "P1",
         "bitrate": "8M", "gop": "4", "lookahead": "0", "bf": "0"},
        gpu_id=0, format=vali.PixelFormat.NV12)
    up = vali.PyFrameUploader(gpu_id=0)
    chunks = []
    pkt = np.zeros(0, dtype=np.uint8)
    yy = np.linspace(30, 220, H4, dtype=np.uint8)[:, None]
    for i in range(n_frames):
        y = np.broadcast_to(yy, (H4, W4)).copy()
        y += np.uint8(i * 5)
        uv = np.full((H4 // 2, W4), 128, np.uint8)
        surf = vali.Surface.Make(vali.PixelFormat.NV12, W4, H4)
        assert up.Run(planes_to_host_frame([y, uv]), surf)[0]
        if enc.EncodeSingleSurface(surf, pkt):
            chunks.append(pkt.tobytes())
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    with open(path, "wb") as f:
        f.write(b"".join(chunks) + flush.tobytes())
    return n_frames


def config3_full_transcode_4k():
    import os
    import tempfile

    import vali_tpu as vali

    path = os.path.join(tempfile.gettempdir(), "vali_bench_4k.h265")
    n_src = _synthesize_4k_hevc(path)

    dec = vali.PyDecoder(path, {}, gpu_id=0)
    rsz = vali.PySurfaceResizer(dec.Format, gpu_id=0)
    rot = vali.PySurfaceRotator(gpu_id=0)
    cvt = vali.PySurfaceConverter(gpu_id=0)
    enc = vali.PyNvEncoder({"s": "1920x1080", "bitrate": "4M"}, gpu_id=0,
                           format=vali.PixelFormat.NV12)
    src = vali.Surface.Make(dec.Format, dec.Width, dec.Height, gpu_id=0)
    small = vali.Surface.Make(dec.Format, 1920, 1080, gpu_id=0)
    rotd = vali.Surface.Make(dec.Format, 1920, 1080, gpu_id=0)
    nv12 = vali.Surface.Make(vali.PixelFormat.NV12, 1920, 1080, gpu_id=0)
    # warm the device ops (first remote compile of the 4K shapes is slow)
    assert rsz.Run(src, small)[0]
    assert rot.Run(small, rotd, 180.0)[0]
    assert cvt.Run(rotd, nv12)[0]
    pkt = np.zeros(0, dtype=np.uint8)
    n = 0
    cut_short = False
    t0 = time.perf_counter()
    while dec.DecodeSingleSurface(src)[0]:
        assert rsz.Run(src, small)[0]
        assert rot.Run(small, rotd, 180.0)[0]
        assert cvt.Run(rotd, nv12)[0]
        enc.EncodeSingleSurface(nv12, pkt)
        n += 1
        if _over_deadline():  # per-frame: each loop costs ~4 tunnel RTTs
            cut_short = True
            break
    t_end = time.perf_counter()
    flush = np.zeros(0, dtype=np.uint8)
    enc.Flush(flush)
    fps = n / (t_end - t0)
    assert cut_short or n == n_src, (n, n_src)
    rec = {"value": round(fps, 2),
           "unit": "frames/sec (host codec + tunnel RTT bound)",
           "frames": n}
    if cut_short:
        rec["note"] = "cut short at the bench deadline"
    return rec


def config4_inference_e2e():
    import jax
    import jax.numpy as jnp

    from vali_tpu.models import fcn
    from vali_tpu.pipeline.multistream import MultiStreamPipeline

    params = fcn.init_params(jax.random.PRNGKey(0))
    infer = jax.jit(fcn.predict_classes)
    # batch_size=16: arrival-order batching amortizes the per-dispatch
    # tunnel RTT over 16 frames (a single stream fills batches itself);
    # the ceiling is then the 1-core software decode rate
    pipe = MultiStreamPipeline([clip_848()], dst_w=224, dst_h=224, gpu_id=0,
                               out_dtype=jnp.float32, batch_size=16)
    n = 0
    last = None
    t0 = None
    cut_short = False
    for batch, ids in pipe:
        last = infer(params, batch)
        if t0 is None:  # first batch pays preprocess+model compile
            np.asarray(last)
            t0 = time.perf_counter()
            continue
        n += batch.shape[0]
        if _over_deadline():  # per-batch: don't overrun into the watchdog
            cut_short = True
            pipe.stop()
            break
    np.asarray(last)
    fps = n / (time.perf_counter() - t0)
    rec = {"value": round(fps, 1),
           "unit": "frames/sec (tunnel RTT bound)", "frames": n}
    if cut_short:
        rec["note"] = "cut short at the bench deadline"
    return rec


def config5_pipeline_64streams(max_batches=3, jpeg_sample=16):
    import vali_tpu as vali
    from vali_tpu.engine.jpeg import jpeg_encode_device
    from vali_tpu.memory.surface import Surface
    from vali_tpu.pipeline.multistream import MultiStreamPipeline

    pipe = MultiStreamPipeline([clip_1080()] * 64, dst_w=224, dst_h=224,
                               gpu_id=0, batch_size=64)
    n = 0
    batches = 0
    last_batch = None
    t0 = None
    t_end = None
    for batch, ids in pipe:
        np.asarray(batch[0, 0, 0])  # materialize the device future
        last_batch = batch
        if t0 is None:  # first batch pays the Pallas kernel compile
            t0 = time.perf_counter()
            continue
        n += batch.shape[0]
        batches += 1
        if batches >= max_batches or _over_deadline():
            # close the timing window BEFORE stop(): queue drain +
            # thread join take 0.2-5s and would deflate a ~1s window
            t_end = time.perf_counter()
            pipe.stop()
            break
    fps = n / ((t_end or time.perf_counter()) - t0)

    jpeg_rate = 0.0
    if last_batch is not None:
        surfaces = [Surface.from_jax(last_batch[i], vali.PixelFormat.RGB)
                    for i in range(min(jpeg_sample, last_batch.shape[0]))]
        tj = time.perf_counter()
        blobs = jpeg_encode_device(surfaces, quality=85)
        jpeg_rate = len(blobs) / (time.perf_counter() - tj)
    return {"value": round(fps, 1),
            "unit": "frames/sec (64x1080p; tunnel H2D ~200MB/batch + "
                    "1-core decode bound)",
            "frames": n,
            "jpeg_per_sec": round(jpeg_rate, 1)}


def config5_pipeline_chipside(B=64, dst=224, K_dispatch=(40, 200),
                              K_jpeg=(200, 2000), sink=None,
                              time_left=None):
    """The north-star config through the PRODUCT pipeline code,
    device-resident: MultiStreamPipeline's real staging/split/dispatch
    path (`_stage_padded` -> `_split` -> `_dispatch_planes`) run from an
    HBM-resident ring of staged batches of REAL decoded 1080p frames —
    the H2D (tunnel-RTT-bound here, see `tunnel_h2d_gbytes_per_sec`)
    replaced by buffer reuse, exactly how a locally-attached deployment
    overlaps staging with compute. Also times the device JPEG stage
    (ops/jpeg.py DCT+quant) on the pipeline's output batch separately
    from host entropy coding.

    ``sink``: optional dict filled PROGRESSIVELY (bench.py registers it
    in RESULT["configs"] before calling, so its watchdog's partial emit
    carries a provisional fps from the short chain even if a long-chain
    compile blocks past budget — r3 and r4 both lost this number).
    ``time_left``: callable returning remaining budget seconds; the
    device-JPEG stage (one more fresh remote compile per chain) is
    skipped when under 140s so the primary fps is never the casualty.

    B/dst/K parameters exist ONLY so tests can run the identical code
    path scaled down on the CPU backend; the bench uses the defaults.
    """
    import jax
    import jax.numpy as jnp

    from vali_tpu.core.enums import PixelFormat
    from vali_tpu.ops.jpeg import jpeg_transform_batch
    from vali_tpu.pipeline.multistream import MultiStreamPipeline

    pipe = MultiStreamPipeline([clip_1080()] * B, dst_w=dst, dst_h=dst,
                               gpu_id=0, batch_size=B)
    # one real batch through the FULL path (decode -> stage -> H2D ->
    # kernel): validates the e2e contract and leaves the staged host
    # batch of real decoded frames in the staging ring
    it = iter(pipe)
    batch, ids = next(it)
    np.asarray(batch[0, 0, 0])
    assert batch.shape == (B, dst, dst, 3), batch.shape
    # Join the stager thread BEFORE touching the staging ring: the
    # background stager keeps prefetching and _staging_acquire reassigns
    # _staging_inflight mid-stage, so a live-thread read races (can see
    # an empty list for seconds through the tunnel). it.close() runs the
    # generator's finally: stop event -> stager join -> pipe.stop().
    it.close()
    ring = [buf for buf, _ in pipe._staging_inflight] + pipe._staging_free
    staged = [buf for buf in ring if buf.shape[0] == B]
    if staged:
        staged_host = staged[0].copy()
    else:
        # XLA route (CPU backend in tests): no pad-staging ring — the
        # pipeline np.stack()s raw decoded frames. Rebuild that batch.
        assert pipe._stage_plane_dims is None, "ring empty on Pallas route"
        import vali_tpu as vali

        dec = vali.PyDecoder(clip_1080(), {}, gpu_id=-1)
        buf = np.zeros(dec.HostFrameSize, dtype=np.uint8)
        frames = []
        while len(frames) < B and dec.DecodeSingleFrame(buf)[0]:
            frames.append(buf.copy())
        staged_host = np.stack((frames * B)[:B])

    # HBM-resident staged planes, exactly as production dispatches them:
    # _stage_one splits the staged batch on the HOST (zero-copy views)
    # and device_puts plane-shaped arrays — the ring holds the same
    # plane-shaped batch and the slope loop carries (and perturbs) it
    # on-device, the buffer-reuse pattern of a local deployment.
    host_planes = pipe._split(staged_host)
    dev_planes = tuple(jax.device_put(p) for p in host_planes)
    jax.block_until_ready(dev_planes)

    # the slope loop perturbs+carries the luma plane; chroma planes ride
    # along as captured residents (same HBM-reuse pattern)
    rest = dev_planes[1:]

    rec = sink if sink is not None else {}
    rec.update({
        "unit": "frames/sec/chip (pipeline code, HBM-resident ring)",
        "note": ("decode+H2D excluded (host-bound on this 1-core "
                 "tunneled host; see sw_decode_fps and h2d lines)")})

    def pipeline_dispatch(p):
        return pipe._dispatch_planes((p,) + rest)

    # 6-digit ms rounding: _slope_time floors a non-positive slope (a
    # host-contended scaled-down run can measure baseline >= kernel) at
    # 1e-9 s, and round(1e-9*1000, 3) would emit a 0.0 that trips the
    # budget tests' > 0 asserts — at real bench scale the extra digits
    # are inert (0.322949 vs 0.323)
    def _provisional(per_call):
        rec.update({"value": round(B / per_call, 1),
                    "ms_per_batch": round(per_call * 1000, 6),
                    "partial": "short-chain estimate"})

    per_batch = _slope_time(pipeline_dispatch, dev_planes[0],
                            K_short=K_dispatch[0], K_long=K_dispatch[1],
                            reps=4, on_short=_provisional)
    rec.pop("partial", None)
    fps = B / per_batch
    rec.update({"value": round(fps, 1),
                "ms_per_batch": round(per_batch * 1000, 6)})

    # device JPEG stage on the pipeline's real output batch — secondary
    # (one more fresh remote compile per chain length), so budget-gated:
    # the primary fps above must survive a watchdog abort
    if time_left is not None and time_left() < 140:
        rec["jpeg_skipped"] = (f"bench budget low ({time_left():.0f}s "
                               "left); builder provenance in docs")
        return rec
    packed = jnp.reshape(batch, (B, dst, dst * 3))
    # the device JPEG stage is ~30 us/batch: K=20/100 chains gave a ~2 ms
    # slope delta — below tunnel jitter, and the reported number swung 3x
    # between runs. 200/2000 puts the delta at ~55 ms.
    per_jpeg = _slope_time(
        lambda x: jpeg_transform_batch(
            (x,), src_fmt=int(PixelFormat.RGB), width=dst, height=dst,
            quality=85)[0],
        packed, K_short=K_jpeg[0], K_long=K_jpeg[1], reps=3)
    rec["jpeg_device_ms_per_batch"] = round(per_jpeg * 1000, 6)
    if per_jpeg > 1e-8:
        rec["jpeg_device_fps"] = round(B / per_jpeg, 1)
    else:
        # slope hit _slope_time's 1e-9 floor: the stage is below chain
        # resolution on this run — an fps of B/1e-9 would be nonsense
        rec["jpeg_device_note"] = ("slope below chain resolution "
                                   "(host-contended run)")
    return rec


# ordered cheap-first so a tight time budget still records the quick
# configs; the host-decode-bound slow ones (3, 5) go last. The third
# field is the minimum seconds of remaining budget a config needs (cold
# remote compiles dominate — observed worst cases through a slow
# tunnel); a config is skipped with a note when less remains.
ALL_CONFIGS = [
    ("1_sw_decode_cpu_convert", config1_decode_convert_cpu, 30),
    # bench.py runs chipside then config 2 up front unconditionally
    # (chipside is the product-path north star and missed the driver
    # line in r3 AND r4; config 2 is cheap warm, ~25-32s) — these rows
    # only matter for a standalone `python3 bench_configs.py` run
    ("5_pipeline_chipside", config5_pipeline_chipside, 120),
    ("2_tpu_two_stage_convert_resize", config2_convert_resize_tpu, 55),
    ("4_decode_preprocess_inference_e2e", config4_inference_e2e, 90),
    ("3_transcode_4k_hevc", config3_full_transcode_4k, 90),
    ("5_pipeline_64x1080p_jpeg", config5_pipeline_64streams, 90),
]


_DEADLINE = None


def _over_deadline() -> bool:
    return _DEADLINE is not None and time.monotonic() > _DEADLINE


def run_all(deadline: float = None, sink: dict = None, progress=None,
            hard_deadline: float = None):
    """Run the five configs; a per-run deadline (time.monotonic value)
    skips remaining configs — and the slow host-bound configs also check
    it between frames/batches — instead of overrunning the caller's
    timeout (this is a one-core machine).

    ``sink``: records land there as each config finishes (bench.py
    passes RESULT["configs"] so its watchdog's partial emit carries
    completed configs). ``progress``: optional per-config stderr logger.
    ``hard_deadline``: cap on the minimum-window extension — bench.py
    passes watchdog_fire_time - 15s so the grace window can never
    schedule work the watchdog will kill mid-config.
    """
    global _DEADLINE
    if deadline is not None:
        # even when the headline sections ran long (slow tunnel), give
        # the configs a minimum window so the quick ones still record
        deadline = max(deadline, time.monotonic() + 150.0)
        if hard_deadline is not None:
            deadline = min(deadline, hard_deadline)
    _DEADLINE = deadline
    results = sink if sink is not None else {}
    for name, fn, min_budget in ALL_CONFIGS:
        if name in results:
            continue  # bench.py ran the target-bearing configs up front
        left = (_DEADLINE - time.monotonic()) if _DEADLINE is not None \
            else float("inf")
        if left < min_budget:
            results[name] = {"skipped": (f"bench time budget exhausted "
                                         f"({left:.0f}s left, needs "
                                         f"{min_budget}s)")}
            continue
        if progress is not None:
            progress(f"config {name} (budget left {left:.0f}s)")
        try:
            results[name] = fn()
        except Exception as e:  # a config failure must not kill the line
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
    return results


if __name__ == "__main__":
    for name, res in run_all().items():
        print(json.dumps({"config": name, **res}))
