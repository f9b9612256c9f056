"""Measure the headline preprocess through bench.py's own _time_kernel
(dynamic-K harness) with an explicit compute dtype — triage for the r5
f32-default question.  Run: timeout 580 python3 -u f32_bench_probe.py bf16|f32

RESULTS (v5e via tunnel, 2026-08-19): bf16 0.314 ms/batch (spread
0.028, 22s wall incl. compile). The f32 arm's dedicated run timed out
in compile (>580s), but the same measure landed in the full bench run
minutes earlier: f32 1.56 ms/batch (spread 0.011) — ~5x bf16. This
pair is what retracted the f32 defaults (PERFORMANCE.md lesson 10).
"""
import sys
import time

import numpy as np

import jax.numpy as jnp

import bench
from vali_tpu.core.enums import ColorRange, ColorSpace
from vali_tpu.ops.pallas_fused import (pallas_nv12_preprocess,
                                       required_pad_rows)

mode = sys.argv[1]
cd = jnp.float32 if mode == "f32" else jnp.bfloat16
B, H, W = 64, 1080, 1920
DH = DW = 224
rng = np.random.default_rng(0)
pad = required_pad_rows(W, H, DH)
x = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2 + pad, W),
                             dtype=np.uint8))
x.block_until_ready()
print(f"staged; timing {mode} preprocess via bench._time_kernel",
      flush=True)
t0 = time.perf_counter()
per_call, spread = bench._time_kernel(
    lambda v: pallas_nv12_preprocess(
        v, src_w=W, src_h=H, dst_w=DW, dst_h=DH,
        space=ColorSpace.BT_709, crange=ColorRange.MPEG,
        compute_dtype=cd),
    x, slice_consume=True,
    on_short=lambda p: print(f"  provisional {p*1e3:.3f} ms", flush=True))
print(f"{mode}: {per_call*1e3:.3f} ms/batch (spread {spread:.3f}, "
      f"wall {time.perf_counter()-t0:.0f}s)", flush=True)
