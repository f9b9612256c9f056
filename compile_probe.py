"""Compile-time probe: ONE chain compile of the 1080p headline
preprocess kernel, f32 vs bf16 compute (r5 compile-budget triage).

Run one mode per process (no cross-compile interference):
  timeout 1200 python3 -u compile_probe.py f32|bf16|convert_f32|convert_bf16

RESULTS (v5e via tunnel, 2026-08-19): bf16 221s, f32 163s back-to-back
— i.e. compile latency through the tunnel is dominated by service
weather, not dtype, at THIS sampling; but across the day f32 compiles
at this shape ranged 163s to >580s (f32_bench_probe timeout) while
bf16 ranged 15-221s, and two same-hour full-bench runs blocked >500s
on the f32 headline compile. Compile variance is a real budget risk
either way; the dynamic-K fold in bench.py halves exposure to it.
"""
import sys
import time

import numpy as np

import jax.numpy as jnp

import bench
from vali_tpu.core.enums import ColorRange, ColorSpace
from vali_tpu.ops.pallas_fused import (pallas_nv12_preprocess,
                                       pallas_nv12_to_rgb,
                                       required_pad_rows)

mode = sys.argv[1]
B, H, W = 64, 1080, 1920
DH = DW = 224
rng = np.random.default_rng(0)
pad = required_pad_rows(W, H, DH)
x = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2 + pad, W),
                             dtype=np.uint8))
x.block_until_ready()
print(f"staged; building {mode} chain", flush=True)

cd = jnp.float32 if mode.endswith("f32") else jnp.bfloat16
if mode.startswith("convert"):
    kern = lambda v: pallas_nv12_to_rgb(
        v, src_w=W, src_h=H, compute_dtype=cd)
else:
    kern = lambda v: pallas_nv12_preprocess(
        v, src_w=W, src_h=H, dst_w=DW, dst_h=DH,
        space=ColorSpace.BT_709, crange=ColorRange.MPEG,
        compute_dtype=cd)

consume = lambda f, xx: jnp.sum(f(xx)[..., :128].astype(jnp.int32))
fn = bench._make_loop(kern, consume)
t0 = time.perf_counter()
float(fn(x, jnp.int32(8), jnp.asarray(True)))
t_compile = time.perf_counter() - t0
print(f"{mode}: chain compile+first-run {t_compile:.0f}s", flush=True)
t0 = time.perf_counter()
float(fn(x, jnp.int32(8), jnp.asarray(True)))
print(f"{mode}: warm K=8 chain {time.perf_counter() - t0 :.3f}s",
      flush=True)
