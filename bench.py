"""vali-tpu benchmark. Prints ONE JSON line with the headline metric.

Headline (BASELINE.json north star): 64 concurrent 1080p H.264 streams
decoded -> NV12 -> RGB -> 224x224, target > 4000 frames/sec/chip on v5e.
The chip-side number is the banded Pallas fused CSC+resize kernel over
64-frame 1080p batches; decode runs on host cores and is reported
separately (this container has a single CPU core — decode scales with
cores, the chip-side number is the framework's ceiling).

Timing method — two-point slope. The axon tunnel adds ~35 ms RPC latency
per fetch and XLA's loop-invariant code motion deletes repeated identical
calls, so: run an on-device fori_loop whose carried input gets a 1-byte
in-place perturbation per iteration (defeats LICM at ~0.03 ms cost,
measured and subtracted), time it at two chain lengths, and take the
slope. This cancels RTT and warmup exactly.
"""

import json
import os
import sys
import threading
import time

import numpy as np

# Progressively-filled result: a watchdog thread emits it if a section
# (typically a remote compile through a degraded tunnel) blocks past the
# wall budget — the driver must ALWAYS get the JSON line. One 590s run
# was externally killed mid-compile with nothing printed; a signal
# handler is not enough because SIGALRM delivery waits out blocking
# C calls, so a daemon thread does the emergency emit.
RESULT = {
    "metric": "64x1080p NV12->RGB->224x224 fused CSC+resize frames/sec/chip",
    "value": 0.0,
    "unit": "frames/sec/chip",
    "vs_baseline": 0.0,
    "configs": {},
}
_DONE = threading.Event()
_EMIT_LOCK = threading.Lock()  # one JSON line, exactly once


def _emit_partial(reason):
    with _EMIT_LOCK:
        if _DONE.is_set():
            return
        _DONE.set()
        RESULT["aborted"] = reason
        # snapshot defensively: the main thread may be inserting into
        # RESULT/configs at this very moment ("dict changed size during
        # iteration" would kill the emergency emit)
        for _ in range(5):
            try:
                snap = dict(RESULT)
                snap["configs"] = dict(RESULT["configs"])
                line = json.dumps(snap)
                break
            except RuntimeError:
                time.sleep(0.05)
        else:
            line = json.dumps({"metric": RESULT["metric"], "value": 0.0,
                               "aborted": reason})
        print(line, flush=True)
    # Deliberately exit 0: the judged artifact is the JSON line on stdout
    # (the driver records it regardless of outcome, and the "aborted"
    # field carries the failure signal). A nonzero status would risk a
    # return-code-gating driver discarding a line that still holds real
    # host-bound numbers from an outage run.
    os._exit(0)


_LAST_SECTION = ["startup"]  # for the watchdog's abort reason


def _progress(t_start, msg):
    _LAST_SECTION[0] = msg
    print(f"[bench {time.monotonic() - t_start:6.1f}s] {msg}",
          file=sys.stderr, flush=True)

K_SHORT = 40
K_LONG = 200  # long chains: the K_LONG-K_SHORT time delta (~70 ms for the
# flagship kernel) must dwarf the tunnel's per-call jitter (~1-3 ms),
# otherwise the slope inherits RTT noise
REPS = 4      # timed repeats per chain length
SLOPES = 5    # independent slope estimates; report the median + spread


def _make_loop(kernel_fn, consume):
    """ONE jitted chain program per kernel. Both knobs are TRACED
    arguments: ``apply_kernel`` (bool) selects kernel-every-iteration
    vs perturbation-only baseline via lax.cond, and the chain length
    ``K`` is a dynamic fori_loop bound — it lowers to a while loop
    whose trip count XLA cannot unroll, so the program is K-independent
    and one remote compile serves the short chain, the long chain, AND
    both baselines. History: r4 spent 275s compiling the headline's 4
    programs (one per (kernel, K, baseline?)); r5's cond-fold halved
    that to 2; then the r5 f32 compute defaults roughly doubled
    big-shape Mosaic compile times (observed 417s for the 1080p f32
    convert, and a 460s-budget abort mid-headline, 2026-08-19), which
    this K-fold absorbs by halving the count again. The cond's
    per-iteration cost is branch-independent and cancels in the
    kernel-minus-baseline subtraction; the slope method itself is
    unchanged (and strictly cleaner: both chain lengths now share one
    executable, so their per-iteration costs are identical by
    construction)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, K, apply_kernel):
        def body(k, carry):
            acc, xx = carry
            patch = (k % 199 + 1).astype(jnp.uint8).reshape(1, 1, 1)
            xx = jax.lax.dynamic_update_slice(xx, patch, (0, 0, 0))
            acc = acc + jax.lax.cond(
                apply_kernel,
                lambda v: consume(kernel_fn, v),
                lambda v: v[0, 0, 0].astype(jnp.int32),
                xx)
            return (acc, xx)

        acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), x))
        return acc

    return run


def _slopes(kernel_fn, x, consume, n=SLOPES, reps=REPS, on_short=None):
    """n independent two-point slope estimates (compile once, interleave
    short/long chains so tunnel drift hits both equally). Also returns
    the slope of the per-chain global minima: tunnel noise is strictly
    additive, so min-of-all-reps is the tightest estimate of each chain's
    true time and their slope is the cleanest per-call number.

    Baseline (kernel-free) chains run through the SAME two compiled
    programs with apply_kernel=False; returns (kernel_slopes, min_slope,
    base_slopes, base_min_slope). ``on_short(per_call_estimate)`` fires
    after the short chain is measured — a provisional single-chain
    number ((t_kernel - t_base)/K, RTT cancels in the subtraction) so a
    watchdog abort during the long-chain compile still carries a value.
    """
    import jax.numpy as jnp

    TRUE = jnp.asarray(True)
    FALSE = jnp.asarray(False)
    fn = _make_loop(kernel_fn, consume)
    Ks = {K: jnp.int32(K) for K in (K_SHORT, K_LONG)}
    gmin = {K_SHORT: float("inf"), K_LONG: float("inf")}
    gmin_base = {K_SHORT: float("inf"), K_LONG: float("inf")}
    base_reps = max(2, reps - 2)

    def measure(K, flag, n_reps):
        best = float("inf")
        for _ in range(n_reps):
            t0 = time.perf_counter()
            float(fn(x, Ks[K], flag))
            best = min(best, time.perf_counter() - t0)
        return best

    # the ONLY remote compile of this measure; warm both cond branches
    float(fn(x, Ks[K_SHORT], TRUE))
    float(fn(x, Ks[K_SHORT], FALSE))
    if on_short is not None:
        tk = measure(K_SHORT, TRUE, 2)
        tb = measure(K_SHORT, FALSE, 2)
        on_short(max((tk - tb) / K_SHORT, 1e-9))
    out, base_out = [], []
    for _ in range(n):
        times, tbase = {}, {}
        for K in (K_SHORT, K_LONG):
            times[K] = measure(K, TRUE, reps)
            gmin[K] = min(gmin[K], times[K])
            tbase[K] = measure(K, FALSE, base_reps)
            gmin_base[K] = min(gmin_base[K], tbase[K])
        dk = K_LONG - K_SHORT
        out.append((times[K_LONG] - times[K_SHORT]) / dk)
        base_out.append((tbase[K_LONG] - tbase[K_SHORT]) / dk)
    min_slope = (gmin[K_LONG] - gmin[K_SHORT]) / (K_LONG - K_SHORT)
    base_min = (gmin_base[K_LONG] - gmin_base[K_SHORT]) / (K_LONG - K_SHORT)
    return out, min_slope, base_out, base_min


def _time_kernel(kernel_fn, x, slice_consume=False, contrast=False,
                 on_short=None):
    """Median per-call time and relative spread across slope estimates.

    slice_consume=True sums only a 128-lane slice of the output — for
    opaque pallas_call outputs this still forces the whole kernel but
    drops the full-output reduce from the measured slope (~0.5 ms/batch
    on 64x224x224x3; see bench_kernel_variants.time_fn). Keep it False
    for XLA-built kernels, where a slice would let the compiler narrow
    the computation itself.

    contrast=True halves the slope/repeat counts: the XLA contrast
    paths are 5-16x slower per call (their long chains alone cost
    ~0.3-0.5 s each) and their numbers only need to be roughly right —
    the full schedule there spent ~40 s of wall budget that then
    squeezed real configs out of the JSON.

    on_short: forwarded to _slopes — provisional per-call estimate
    callback after the first (short) chain, before the long compile.
    """
    import jax.numpy as jnp

    if slice_consume:
        consume = lambda f, xx: jnp.sum(f(xx)[..., :128].astype(jnp.int32))
    else:
        consume = lambda f, xx: jnp.sum(f(xx).astype(jnp.int32))
    n, reps = (2, 2) if contrast else (SLOPES, REPS)
    with_kernel, min_slope, base_list, base_min = _slopes(
        kernel_fn, x, consume, n=n, reps=reps, on_short=on_short)
    baseline = np.median(base_list)
    per_call = [max(s - baseline, 1e-9) for s in with_kernel]
    med = float(np.median(per_call))
    spread = (max(per_call) - min(per_call)) / med if med > 0 else 0.0
    # report the min-of-chains slope (tightest additive-noise estimate),
    # bounded by the median so a lucky pairing can't overstate
    val = float(min(med, max(min_slope - base_min, 1e-9)))
    return val, spread


def main():
    _t_start = time.monotonic()

    # total wall budget: the driver must get the JSON line even when the
    # tunnel is slow — secondary sections degrade to zeros, configs
    # shrink to the quick ones, and a watchdog emits whatever has been
    # collected if a started section blocks past budget+60s
    total_budget = float(os.environ.get("VALI_BENCH_BUDGET_S", "460"))
    # the reason names the blocked section at fire time (lambda reads
    # _LAST_SECTION late): a 0.0-headline abort line should say WHERE it
    # blocked — "during 'timing headline Pallas kernel'" means the very
    # first remote compile never returned (observed >450s tunnel states),
    # not that the measurement failed
    watchdog = threading.Timer(
        total_budget + 60.0,
        lambda: _emit_partial(
            f"watchdog: exceeded {total_budget}+60s wall budget "
            f"during '{_LAST_SECTION[0]}'"))
    watchdog.daemon = True
    watchdog.start()

    def time_left():
        return total_budget - (time.monotonic() - _t_start)

    def progress(msg):
        _progress(_t_start, msg)

    # --- host-bound section FIRST: single-stream sw decode fps and the
    # config-1 decode+CPU-convert rate need no TPU at all, so they run
    # before the device probe — a dead tunnel must never zero numbers
    # that were perfectly measurable (round-3 verdict #2)
    progress("host-bound section: sw decode + config 1")
    decode_fps = decode_spread = 0.0
    try:
        import bench_configs
        import vali_tpu as vali

        clip = bench_configs.clip_848()
        samples = []
        for _ in range(3):
            dec = vali.PyDecoder(clip, {}, gpu_id=-1)
            frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
            n = 0
            td = time.perf_counter()
            while dec.DecodeSingleFrame(frame)[0]:
                n += 1
            samples.append(n / (time.perf_counter() - td))
        decode_fps = float(np.median(samples))
        if decode_fps > 0:
            decode_spread = (max(samples) - min(samples)) / decode_fps
    except Exception:
        pass
    RESULT.update({
        "sw_decode_fps_single_stream_848x464": round(decode_fps, 1),
        "sw_decode_fps_spread": round(decode_spread, 3),
    })
    run_configs = os.environ.get("VALI_BENCH_CONFIGS", "1") != "0"
    if run_configs:
        try:
            RESULT["configs"]["1_sw_decode_cpu_convert"] = \
                bench_configs.config1_decode_convert_cpu()
        except Exception as e:
            RESULT["configs"]["1_sw_decode_cpu_convert"] = {
                "error": f"{type(e).__name__}: {e}"[:200]}

    # fail fast on a dead tunnel: jax.devices() blocks forever during an
    # outage (observed live); probe in a thread and emit the line early
    # instead of burning the whole budget waiting for the watchdog
    probe = {}

    def _probe_device():
        import jax as _jax

        probe["device"] = str(_jax.devices()[0])

    pt = threading.Thread(target=_probe_device, daemon=True)
    pt.start()
    pt.join(timeout=120.0)
    if "device" not in probe:
        _emit_partial("device unresponsive after 120s (tunnel outage?)")
    progress("device probe ok: " + probe["device"])

    import jax
    import jax.numpy as jnp

    from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
    from vali_tpu.ops.fused import fused_preprocess
    from vali_tpu.ops.pallas_fused import (pallas_nv12_preprocess,
                                           required_pad_rows)

    RESULT["device"] = probe["device"]
    B, H, W = 64, 1080, 1920
    DH = DW = 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    # keep the HOST array around: slicing it for the contrast/staging
    # sections on the host avoids re-fetching ~200 MB back through the
    # 35ms-RTT tunnel (np.asarray on a device array is a device read)
    nv12_host = rng.integers(0, 256, (B, H * 3 // 2 + pad, W),
                             dtype=np.uint8)
    nv12_padded = jnp.asarray(nv12_host)
    progress("arrays staged; timing headline Pallas kernel")

    def _headline_provisional(per_call):
        # single-short-chain estimate, overwritten by the slope below —
        # lands a nonzero headline even if the long-chain compile blocks
        # past the watchdog on a degraded tunnel
        RESULT.update({
            "value": round(B / per_call, 1),
            "vs_baseline": round(B / per_call / 4000.0, 3),
            "ms_per_64frame_batch_pallas": round(per_call * 1000, 3),
            "headline_partial": "short-chain estimate",
        })

    per_batch_pallas, spread = _time_kernel(
        lambda x: pallas_nv12_preprocess(
            x, src_w=W, src_h=H, dst_w=DW, dst_h=DH,
            space=ColorSpace.BT_709, crange=ColorRange.MPEG),
        nv12_padded, slice_consume=True, on_short=_headline_provisional)
    RESULT.pop("headline_partial", None)
    fps = B / per_batch_pallas
    in_bytes = nv12_padded.nbytes
    out_bytes = B * DH * DW * 3
    gbps = (in_bytes + out_bytes) / per_batch_pallas / 1e9
    RESULT.update({
        "value": round(fps, 1),
        "vs_baseline": round(fps / 4000.0, 3),
        "ms_per_64frame_batch_pallas": round(per_batch_pallas * 1000, 3),
        "pallas_slope_spread": round(spread, 3),
        "hbm_gbytes_per_sec": round(gbps, 1),
    })
    # --- target-bearing configs: chipside FIRST (the product-path
    # north-star number — it missed the driver line in r3 AND r4; the
    # cheap config 2 can afford to be the one at risk, round-4 verdict
    # #1), then config 2, unconditionally (no budget gate). XLA-contrast
    # and 4K sections are trimmed first instead. chipside fills its
    # record in RESULT["configs"] progressively (provisional value after
    # its short chain, device-JPEG stage budget-gated at the end), so
    # even a watchdog abort mid-config carries a number.
    if run_configs:
        import bench_configs

        progress("target-bearing config 5_pipeline_chipside")
        chipside_rec = {}
        RESULT["configs"]["5_pipeline_chipside"] = chipside_rec
        try:
            bench_configs.config5_pipeline_chipside(
                sink=chipside_rec, time_left=time_left)
        except Exception as e:
            chipside_rec.setdefault(
                "error", f"{type(e).__name__}: {e}"[:200])
        progress("target-bearing config 2_tpu_two_stage_convert_resize")
        try:
            RESULT["configs"]["2_tpu_two_stage_convert_resize"] = \
                bench_configs.config2_convert_resize_tpu()
        except Exception as e:
            RESULT["configs"]["2_tpu_two_stage_convert_resize"] = {
                "error": f"{type(e).__name__}: {e}"[:200]}

    # secondary: batched 4K NV12 -> 1080p resize. Headline = the banded
    # Pallas kernel (pallas_nv12_resize); the dense-einsum XLA path
    # (PySurfaceResizer's op) is kept as the contrast number. Runs
    # BEFORE the 1080p XLA contrast: it is a headline-table number
    # (round-4 verdict #4 — stale since r3), the contrast is supporting
    # evidence. Gates are tuned for the cond-folded measure (ONE remote
    # compile per chain, r5): the r4 gates (220/260s) assumed twice the
    # compiles and starved both sections two rounds running.
    from vali_tpu.ops.pallas_fused import (pallas_nv12_resize,
                                           required_pad_rows_resize)
    from vali_tpu.ops.resize import resize_batch

    B4 = 8
    # resize batches 16 frames: 8-frame chains inherit tunnel jitter
    # (10.5% vs 2.4% spread measured) and under-amortize grid startup
    # (26.5 vs 24.7 us/frame)
    B4R = 16
    resize_4k_fps = resize_4k_fps_xla = preprocess_4k_fps = 0.0
    if time_left() > 160:
        progress("timing 4K resize (Pallas + XLA contrast)")
        pad4 = required_pad_rows_resize(3840, 2160, 1920, 1080)
        nv12_4k = jnp.asarray(rng.integers(
            0, 256, (B4R, 2160 * 3 // 2 + pad4, 3840), dtype=np.uint8))
        per_batch_resize, _ = _time_kernel(
            lambda x: pallas_nv12_resize(x, src_w=3840, src_h=2160,
                                         dst_w=1920, dst_h=1080),
            nv12_4k, slice_consume=True,
            on_short=lambda pc: RESULT.update(
                {"resize_4k_to_1080p_nv12_fps": round(B4R / pc, 1),
                 "resize_4k_partial": "short-chain estimate"}))
        RESULT.pop("resize_4k_partial", None)
        resize_4k_fps = B4R / per_batch_resize
        RESULT["resize_4k_to_1080p_nv12_fps"] = round(resize_4k_fps, 1)
        if time_left() > 110:
            per_batch_resize_xla, _ = _time_kernel(
                lambda x: resize_batch((x[:8, :2160 * 3 // 2],),
                                       PixelFormat.NV12,
                                       3840, 2160, 1920, 1080)[0],
                nv12_4k, contrast=True)
            resize_4k_fps_xla = 8 / per_batch_resize_xla
            RESULT["resize_4k_to_1080p_nv12_fps_xla"] = round(
                resize_4k_fps_xla, 1)

    if time_left() > 110:
        progress(f"headline {fps:.0f} fps; timing XLA contrast")
        # uploaded lazily: only this gated section consumes the unpadded
        # view, so a time-trimmed run never pays the ~200 MB upload
        nv12 = jnp.asarray(nv12_host[:, :H * 3 // 2, :])
        per_batch_xla, _ = _time_kernel(
            lambda x: fused_preprocess(
                (x,), PixelFormat.NV12, W, H, DW, DH,
                ColorSpace.BT_709, ColorRange.MPEG),
            nv12, contrast=True)
        RESULT["ms_per_64frame_batch_xla"] = round(per_batch_xla * 1000, 3)

    # 4K straight to model input in ONE fused pass (same kernel, bigger
    # source: decimation makes it even closer to its DMA floor)
    if time_left() > 70:
        progress("timing 4K fused preprocess")
        pad4p = required_pad_rows(3840, 2160, DH)
        nv12_4kp = jnp.asarray(rng.integers(
            0, 256, (B4, 2160 * 3 // 2 + pad4p, 3840), dtype=np.uint8))
        per_batch_pre4k, _ = _time_kernel(
            lambda x: pallas_nv12_preprocess(x, src_w=3840, src_h=2160,
                                             dst_w=DW, dst_h=DH),
            nv12_4kp, slice_consume=True)
        preprocess_4k_fps = B4 / per_batch_pre4k
        RESULT["preprocess_4k_to_224_fps"] = round(preprocess_4k_fps, 1)

    # secondary: H2D staging bandwidth of THIS TUNNELED ENVIRONMENT (the
    # pipeline's device_put path). Through the axon tunnel this measures
    # RPC round-trips, NOT a framework or TPU property — locally-attached
    # TPU VMs see PCIe-class rates instead — hence the tunnel_ prefix
    # (round-3 verdict #7; docs/PERFORMANCE.md "tunnel H2D" section).
    h2d_gbps = h2d_spread = 0.0
    progress("timing tunnel H2D staging")
    try:
        stage = np.ascontiguousarray(nv12_host[:16])  # ~50 MB host batch
        jax.block_until_ready(jax.device_put(stage))  # warm
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(stage))
            samples.append(stage.nbytes / (time.perf_counter() - t0) / 1e9)
        h2d_gbps = float(np.median(samples))
        if h2d_gbps > 0:
            h2d_spread = (max(samples) - min(samples)) / h2d_gbps
    except Exception:
        pass

    RESULT.update({
        "tunnel_h2d_gbytes_per_sec": round(h2d_gbps, 2),
        "tunnel_h2d_spread": round(h2d_spread, 3),
    })

    # remaining BASELINE.json configs (see bench_configs.py) — 1, 2 and
    # chipside already ran above and run_all skips keys present in the
    # sink. Skippable via VALI_BENCH_CONFIGS=0 for a headline-only run.
    # run_all writes each config's record into RESULT["configs"] as it
    # lands, so the watchdog's partial emit carries finished configs too.
    if run_configs:
        import bench_configs

        progress("running remaining BASELINE configs")
        bench_configs.run_all(deadline=_t_start + total_budget,
                              sink=RESULT["configs"],
                              progress=progress,
                              hard_deadline=_t_start + total_budget + 45)

    RESULT.setdefault("ms_per_64frame_batch_xla", 0.0)
    RESULT.setdefault("resize_4k_to_1080p_nv12_fps", 0.0)
    RESULT.setdefault("resize_4k_to_1080p_nv12_fps_xla", 0.0)
    RESULT.setdefault("preprocess_4k_to_224_fps", 0.0)
    with _EMIT_LOCK:
        if not _DONE.is_set():
            _DONE.set()
            watchdog.cancel()
            print(json.dumps(RESULT))


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the line must still print
        import traceback

        traceback.print_exc()
        _emit_partial(f"error: {type(e).__name__}: {e}"[:300])
