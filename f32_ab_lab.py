"""f32-vs-bf16 compute A/B for the convert/resize Pallas kernels (r5 lab).

Lesson 10 in docs/PERFORMANCE.md: the fused PREPROCESS family got faster
by switching to f32 compute because it is MXU-occupancy-bound at M=32.
The convert/resize kernels are store- or input-stream-bound, so the
argument does not transfer automatically — this notebook measures it.

Shapes are the product/bench shapes:
  convert   pallas_nv12_to_rgb      64 x 1080p            (store-bound)
  packed    pallas_packed_resize    64 x 1080p -> 224 RGB  (config 2 leg)
  resize4k  pallas_nv12_resize      16 x 2160p -> 1080p    (MXU-bound)

Method: the house two-point slope (on-device fori_loop, 1-byte
loop-carry perturbation, slope between two chain lengths, median of 3,
best-of-reps per point; consume a 128-lane slice — bench.py rationale).

Run: timeout 900 python3 -u f32_ab_lab.py [convert packed resize4k]

RESULTS (v5e via tunnel, 2026-08-19, this file's provenance run):
  convert   bf16 2.281 ms/batch (spread 0.049)   f32 2.234 ms/batch (0.032)
  packed    bf16 0.510 ms/batch (0.029)          f32 0.486 ms/batch (0.059)
  resize4k  bf16 0.407 ms/batch (0.018)          f32 0.755 ms/batch (0.003)
Reading: the store-bound convert and packed-resize kernels hide the f32
MAC doubling completely (f32 measured at or slightly under bf16 — the
deleted bf16 inter-pass casts again), so both defaults flipped to f32
(bit-exact vs the XLA paths, ≤1-LSB accumulation ties at some
geometries). The 4K NV12 resize is genuinely MXU-MAC-bound: f32 costs
1.86x, so uint8 stays bf16 there (compute_dtype=jnp.float32 remains the
exactness knob).

On-chip value validation of the flipped defaults (same day, real v5e,
through the product wrappers PySurfaceConverter/PySurfaceResizer vs
their use_pallas=False XLA routes on the same chip, 1080p NV12->RGB
then ->224): convert dmax=1 with 4.3e-6 of pixels differing, packed
resize dmax=1 at 6.6e-6 — pure banded-vs-dense accumulation ties, the
bf16-era 1-2 LSB coefficient-rounding envelope is gone.
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
        for cd, label in ((None, "bf16"), (jnp.float32, "f32")):
            print(f"{name} {label} ...", flush=True)
            ms, spread = time_fn(lambda a: build(a, cd), x, K=K)
            print(f"  {name:9s} {label:4s} {ms * 1e3:7.3f} ms/batch "
                  f"(spread {spread:.3f})", flush=True)


if __name__ == "__main__":
    main()
