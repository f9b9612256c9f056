"""Probe: does the cond-folded chain (r5 bench refactor) tax XLA-path
timing vs the r3/r4 separate-baseline method?

The Pallas chains measured identically under both (0.324 vs 0.323 ms),
but the r5 XLA contrast numbers came out 1.6-3x slower than their r3
provenance (ms_per_64frame_batch_xla 1.6 -> 2.635; 4K XLA resize 3.2k ->
1.0k fps). Hypothesis: embedding the dense-einsum program in a lax.cond
branch blocks XLA's cross-iteration scheduling/hoisting, so the cond
method OVERSTATES the Pallas-vs-XLA ratio. This probe times the same
kernel both ways in one process; if the legacy method is materially
faster, the bench's contrast sections must use it (honest contrast
matters more than the halved compile count there).

Usage: timeout 560 python3 -u xla_contrast_probe.py

RESULT (2026-08-19, v5e via tunnel, K=4/12 chains, reps=4):
    cond method:   2.461 ms/call   (compile+warm 181s, both flags)
    plain method:  3.663 ms/call   (compile+warm 25s for 4 programs)
    ratio cond/plain: 0.67
RE-RUN after the traced-K refactor (same day; the probe now calls the
new one-program _make_loop(kernel, consume) -> run(x, K, apply_kernel)
shape — the old per-K call shape broke at import-time signature level):
    cond method:   2.723 ms/call   (compile+warm 249s, ONE program)
    plain method:  3.626 ms/call   (compile+warm 22s)
    ratio cond/plain: 0.75 — conclusion unchanged.
Hypothesis REFUTED: the cond chain is the FASTER (tighter) measure of
the XLA path, not a tax — the r5 driver value (2.635 ms at K=40/200,
(2,2) schedule) is honest, and the r3 1.6 ms provenance was that run's
own short-schedule jitter. Contrast numbers keep their "roughly right"
status; the headline ratio claims in docs are stamped with the r5
measured values.
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
    from vali_tpu.ops.fused import fused_preprocess

    B, W, H, DW, DH = 64, 1920, 1080, 224, 224
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W), dtype=np.uint8))

    def kernel(v):
        return fused_preprocess((v,), PixelFormat.NV12, W, H, DW, DH,
                                ColorSpace.BT_709, ColorRange.MPEG)

    consume = lambda f, xx: jnp.sum(f(xx).astype(jnp.int32))
    K_S, K_L = 4, 12

    # the cond chain under test IS bench.py's — imported, not copied, so
    # the probe cannot silently diverge from the method it validates.
    # Post-refactor signature: _make_loop(kernel, consume) -> run(x, K,
    # apply_kernel) with K a traced fori_loop bound (one program total).
    from bench import _make_loop

    cond_run = _make_loop(kernel, consume)
    Kj = {K: jnp.int32(K) for K in (K_S, K_L)}

    def make_plain(K, use_fn):
        @jax.jit
        def run(v):
            def body(k, carry):
                acc, xx = carry
                patch = (k % 199 + 1).astype(jnp.uint8).reshape(1, 1, 1)
                xx = jax.lax.dynamic_update_slice(xx, patch, (0, 0, 0))
                if use_fn:
                    acc = acc + consume(kernel, xx)
                else:
                    acc = acc + xx[0, 0, 0].astype(jnp.int32)
                return (acc, xx)
            acc, _ = jax.lax.fori_loop(0, K, body, (jnp.int32(0), v))
            return acc
        return run

    def best(fn, *args, reps=4):
        b = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            b = min(b, time.perf_counter() - t0)
        return b

    print("compiling cond chain (one program, traced K)...", flush=True)
    t0 = time.perf_counter()
    TRUE, FALSE = jnp.asarray(True), jnp.asarray(False)
    float(cond_run(x, Kj[K_S], TRUE)); float(cond_run(x, Kj[K_S], FALSE))
    print(f"  cond compile+warm {time.perf_counter()-t0:.0f}s", flush=True)
    tk = {K: best(cond_run, x, Kj[K], TRUE) for K in (K_S, K_L)}
    tb = {K: best(cond_run, x, Kj[K], FALSE) for K in (K_S, K_L)}
    slope_cond = ((tk[K_L] - tk[K_S]) - (tb[K_L] - tb[K_S])) / (K_L - K_S)
    print(f"cond method:  {slope_cond*1000:.3f} ms/call", flush=True)

    print("compiling plain chains...", flush=True)
    t0 = time.perf_counter()
    plain_k = {K: make_plain(K, True) for K in (K_S, K_L)}
    plain_b = {K: make_plain(K, False) for K in (K_S, K_L)}
    for K in (K_S, K_L):
        float(plain_k[K](x)); float(plain_b[K](x))
    print(f"  plain compile+warm {time.perf_counter()-t0:.0f}s", flush=True)
    tk = {K: best(plain_k[K], x) for K in (K_S, K_L)}
    tb = {K: best(plain_b[K], x) for K in (K_S, K_L)}
    slope_plain = ((tk[K_L] - tk[K_S]) - (tb[K_L] - tb[K_S])) / (K_L - K_S)
    print(f"plain method: {slope_plain*1000:.3f} ms/call", flush=True)
    print(f"ratio cond/plain: {slope_cond/slope_plain:.2f}", flush=True)


if __name__ == "__main__":
    main()
