"""f32-vs-bf16 compute A/B for the convert/resize Pallas kernels (r5 lab).

*** RETRACTED — this lab's original run had mislabeled rows. ***
The "bf16" arms below were built with compute_dtype=None while a
mid-edit shared default already resolved None to f32 for the convert
and packed kernels, so their "f32 ≈ bf16" readings compared f32
against itself. The 4K-resize row (dtype logic still inline, truly
bf16 vs f32) was the only honest pair — and it showed the real 1.86x
gap. Corrected paired probes through bench.py's harness with BOTH
dtypes explicit (f32_bench_probe.py, same day): preprocess 0.314 ms
bf16 vs 1.56 ms f32 (~5x). All uint8 defaults are bf16; see
docs/PERFORMANCE.md lesson 10 for the post-mortem. The lambda below
now passes both arms explicitly so the mistake cannot recur.

Original (flawed) premise, kept for the record: lesson 10 claimed the
fused PREPROCESS family got faster by switching to f32 compute because
it is MXU-occupancy-bound at M=32; the convert/resize kernels are
store- or input-stream-bound, so this lab "measured" whether the
argument transfers.

Shapes are the product/bench shapes:
  convert   pallas_nv12_to_rgb      64 x 1080p            (store-bound)
  packed    pallas_packed_resize    64 x 1080p -> 224 RGB  (config 2 leg)
  resize4k  pallas_nv12_resize      16 x 2160p -> 1080p    (MXU-bound)

Method: the house two-point slope (on-device fori_loop, 1-byte
loop-carry perturbation, slope between two chain lengths, median of 3,
best-of-reps per point; consume a 128-lane slice — bench.py rationale).

Run: timeout 900 python3 -u f32_ab_lab.py [convert packed resize4k]

RESULTS of the original (RETRACTED — see header) run, v5e 2026-08-19:
  convert   "bf16" 2.281 ms (0.049)   f32 2.234 ms (0.032)  <- f32 vs f32
  packed    "bf16" 0.510 ms (0.029)   f32 0.486 ms (0.059)  <- f32 vs f32
  resize4k   bf16  0.407 ms (0.018)   f32 0.755 ms (0.003)  <- honest pair
The only valid reading is the resize4k row: f32 HIGHEST costs 1.86x on
the MXU-MAC-bound 4K resize. The convert/packed "parity" rows measured
the f32 kernel against itself.

Still-valid side note from the same day (on-chip value check, product
wrappers vs their use_pallas=False XLA routes): with
compute_dtype=jnp.float32 the convert and packed resize match the
exact path at dmax=1 with 4.3e-6 / 6.6e-6 of pixels differing — f32
remains the correct EXACTNESS knob, it is just not free.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vali_tpu.ops.pallas_fused import (
    pallas_nv12_resize, pallas_nv12_to_rgb, pallas_packed_resize,
    required_pad_rows_resize)


def time_fn(fn, x, K=(8, 40), reps=5, slopes=3):
    """Two-point slope (bench_kernel_variants.time_fn, 3D-input form)."""
    def make(Kn):
        @jax.jit
        def run(xx):
            def body(k, carry):
                acc, a = carry
                patch = (k % 199 + 1).astype(jnp.uint8).reshape(1, 1, 1)
                a = jax.lax.dynamic_update_slice(a, patch, (0, 0, 0))
                out = fn(a)
                return (acc + jnp.sum(out[..., :128].astype(jnp.int32)),
                        a)
            acc, _ = jax.lax.fori_loop(0, Kn, body, (jnp.int32(0), xx))
            return acc
        return run

    fns = {Kn: make(Kn) for Kn in K}
    for Kn, f in fns.items():
        t0 = time.perf_counter()
        float(f(x))
        print(f"    compiled K={Kn} in {time.perf_counter() - t0:.0f}s",
              flush=True)
    out = []
    for _ in range(slopes):
        t = {}
        for Kn in K:
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                float(fns[Kn](x))
                best = min(best, time.perf_counter() - t0)
            t[Kn] = best
        out.append((t[K[1]] - t[K[0]]) / (K[1] - K[0]))
    return float(np.median(out)), (max(out) - min(out)) / np.median(out)


def main():
    rng = np.random.default_rng(0)
    which = sys.argv[1:] or ["convert", "packed", "resize4k"]

    cases = {}
    if "convert" in which:
        B, H, W = 64, 1080, 1920
        nv = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W),
                                      dtype=np.uint8))
        cases["convert"] = (nv, (8, 40), lambda x, cd: pallas_nv12_to_rgb(
            x, src_w=W, src_h=H, compute_dtype=cd))
    if "packed" in which:
        B, H, W, DH, DW = 64, 1080, 1920, 224, 224
        pk = jnp.asarray(rng.integers(0, 256, (B, H, W * 3),
                                      dtype=np.uint8))
        cases["packed"] = (pk, (40, 200),
                           lambda x, cd: pallas_packed_resize(
            x, src_w=W, src_h=H, dst_w=DW, dst_h=DH, compute_dtype=cd))
    if "resize4k" in which:
        B, H, W, DH, DW = 16, 2160, 3840, 1080, 1920
        pad = required_pad_rows_resize(W, H, DW, DH)
        nv4 = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2 + pad, W),
                                       dtype=np.uint8))
        cases["resize4k"] = (nv4, (40, 200),
                             lambda x, cd: pallas_nv12_resize(
            x, src_w=W, src_h=H, dst_w=DW, dst_h=DH, compute_dtype=cd))

    for name, (x, K, build) in cases.items():
        # BOTH arms explicit — never let one arm ride a default that
        # might be mid-edit (the retraction in this file's header)
        for cd, label in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
            print(f"{name} {label} ...", flush=True)
            ms, spread = time_fn(lambda a: build(a, cd), x, K=K)
            print(f"  {name:9s} {label:4s} {ms * 1e3:7.3f} ms/batch "
                  f"(spread {spread:.3f})", flush=True)


if __name__ == "__main__":
    main()
