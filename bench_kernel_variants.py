"""Scratch harness: measure Pallas NV12 kernel variants on the real TPU.

Not part of the library — the lab notebook behind ops/pallas_fused.py's
design. Measured on v5e (64x1080p -> 224x224, ms/batch):

  production (scalar-prefetch dynamic slices)   0.516
  B  whole-frame u8->bf16 conversion once       0.673   (slower: big
     serial VPU block + VMEM round trip beats per-tile re-conversion)
  C  B + short cast chain u8->i32->bf16         0.682
  short chain in production structure           0.500   (noise-level)
  grouped G: 2 luma + 2 chroma tiles, M=128     0.880   (block-diag
     zero FLOPs are real; Mosaic handles M=32 fine)
  static window slices (ADOPTED)                0.445
  static + align=8 (ADOPTED)                    0.444
  multiframe M2/M4/M8 grid steps                0.431/0.455/0.543
  transposed-chroma deinterleave                1.406   (Mosaic transpose
     of [224,1920] bf16 dwarfs the 192 MFLOP interleave-tax saving)
  DMA floor (stream-only kernel)                0.230 = 932 GB/s
  strided LANE slice ch[:, 0::2]                Mosaic compile error
  full int8 kernel (s8xs8->s32 both passes,     0.419-0.422  (vs 0.426-
     pow2-scaled weights, i8 intermediates)      0.430 bf16: ~2%, NOT the
     2x hoped for — a pure-dot probe shows Mosaic int8 dot runs at the
     SAME rate as bf16 on v5e (~320 T(FL)OPS both at [224,1920]x[1920,448];
     no int8 MXU speedup is exposed). Quality cost maxdiff=12 PSNR 49 dB
     -> not worth shipping.  int8 probe notes: dot(i8,i8)->i32 exact;
     u8->i32-128->i8 ok; i32 shifts ok; i8 vector ADD unsupported.
  cast chain u8->i16->bf16 (ADOPTED)            0.426   (vs 0.430 long
     chain u8->i32->f32->bf16: ~1%, kept for simplicity — i16 halves the
     widening vregs and is exact; u8->bf16 and u16->bf16 stay unsupported)

  COMBO (round 3): M2/M4 grid steps + static    0.358/0.358  (vs 0.327
     windows + banded W + chroma-half padding    production same session;
     — the round-2 "never combined" follow-up.   dead end: the W-pass M
     The M2 win (0.431 vs 0.516) existed only    was already amortized by
     under the dense-W structure; with banding   banding, and G>1 halves
     the W matmuls are ~1.2us/frame and double-  the grid's DMA overlap
     M saves less than the larger VMEM blocks    depth)
     cost. TILE=64 re-confirmed catastrophic
     under the current structure too:
     G=1/tile=64 -> 1.049, G=2/tile=64 -> 1.088.
  banded W-pass (ADOPTED)                       0.392-0.399  (Lanczos
     bands cover ~60% of the dense [W, DW] matrices at 1080p->224;
     128-lane output tiles with aligned input windows, bit-identical)
  chroma W halves padded per-tile (ADOPTED)     0.331   (a 128-lane tile
     straddling the concatenated U|V boundary spans the whole input and
     silently forced the chroma banding dense; padding each half to a
     LANE_TILE multiple localizes the bands -> windows 1280 of 1920)

  round-4 candidate (2026-08-18): "fuse the H-pass chroma and luma DMAs
     into one slab now that windows are static" (round-3 verdict #8) —
     structurally already the case: the kernel's only input DMA is the
     single whole-frame BlockSpec((1, rows, W)) block per grid step
     (pallas_fused.py in_specs[0]); the luma/chroma H-pass "windows"
     are static VMEM slices of that resident slab, not separate DMAs.
     Nothing to fuse; no new measurement possible. The remaining gap to
     the 0.23 ms floor stays the M=32 H-pass occupancy story below.

Conclusion: the adopted kernel is compute-bound at ~6.2 us/frame with
DMA fully hidden. Budget at the measured 324 T(FL)OPS dot rate:
banded W-pass ~1.2 us, H-pass ~2.7 us (M=32 tiles cap MXU occupancy at
~25%; every variant that raises M — grouping, bigger TILE, multiframe
M4/M8 — loses more to zero-tax/VMEM than it gains), casts+CSC tail
~1.5 us. A perfect kernel would hit the 0.23 ms DMA floor; the
realistic floor with this H-pass structure is ~0.3 ms, and we measure
0.33 (193k fps/chip, 638 GB/s).
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from vali_tpu.core.enums import ColorRange, ColorSpace
from vali_tpu.ops import colors
from vali_tpu.ops.pallas_fused import (ALIGN, TILE, _banded_h_weights,
                                       _chroma_w_weights_interleaved,
                                       _w_weights, pallas_nv12_preprocess,
                                       required_pad_rows)
from vali_tpu.ops.resize import LANCZOS_AA


def variant_kernel(nv12, *, src_w, src_h, dst_w, dst_h,
                   space=ColorSpace.BT_709, crange=ColorRange.MPEG,
                   variant="B", tile=TILE, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = nv12.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    cdt = jnp.bfloat16

    y_starts, y_blocks, y_win, y_end = _banded_h_weights(H, DH, LANCZOS_AA)
    c_starts, c_blocks, c_win, c_end = _banded_h_weights(
        H // 2, DH, LANCZOS_AA, row_offset=H, chroma_of=H)
    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]

    wyw = jnp.asarray(_w_weights(W, DW, LANCZOS_AA)).astype(cdt)
    wcw_i = jnp.asarray(
        _chroma_w_weights_interleaved(W, DW, LANCZOS_AA)).astype(cdt)
    # deinterleaved chroma weights: U taps on even lanes -> [W/2, DW]
    wcw_full = _chroma_w_weights_interleaved(W, DW, LANCZOS_AA)
    wcw_half = jnp.asarray(wcw_full[0::2, :DW]).astype(cdt)  # [W/2, DW]
    n_tiles = y_blocks.shape[0]

    m, y_off = colors.yuv2rgb_matrix(space, crange)
    m = m.astype(np.float32)

    def _conv(x):
        if variant == "B":
            return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)
        return x.astype(jnp.int32).astype(cdt)  # C, D: skip the f32 hop

    def kernel(ystart_ref, cstart_ref, frame_ref, yblk_ref, cblk_ref,
               wyw_ref, wcw_ref, wcwh_ref, out_ref, fbf_ref, yh_ref, ch_ref):
        # whole-frame conversion once (B, C, D)
        fbf_ref[...] = _conv(frame_ref[0])

        def h_tile(t, _):
            ys = pl.multiple_of(ystart_ref[t], ALIGN)
            cs = pl.multiple_of(cstart_ref[t], ALIGN)
            yh_ref[pl.ds(t * tile, tile), :] = jnp.dot(
                yblk_ref[t].astype(cdt), fbf_ref[pl.ds(ys, y_win), :],
                preferred_element_type=jnp.float32).astype(cdt)
            ch_ref[pl.ds(t * tile, tile), :] = jnp.dot(
                cblk_ref[t].astype(cdt), fbf_ref[pl.ds(cs, c_win), :],
                preferred_element_type=jnp.float32).astype(cdt)
            return 0

        jax.lax.fori_loop(0, n_tiles, h_tile, 0)

        yw = jnp.dot(yh_ref[:DH, :], wyw_ref[...],
                     preferred_element_type=jnp.float32)
        if variant == "D":
            ue = ch_ref[:DH, 0::2]   # [DH, W/2] strided lane slice
            vo = ch_ref[:DH, 1::2]
            u = jnp.dot(ue, wcwh_ref[...],
                        preferred_element_type=jnp.float32) - 128.0
            v = jnp.dot(vo, wcwh_ref[...],
                        preferred_element_type=jnp.float32) - 128.0
        else:
            cw = jnp.dot(ch_ref[:DH, :], wcw_ref[...],
                         preferred_element_type=jnp.float32)
            u = cw[:, :DW] - 128.0
            v = cw[:, DW:] - 128.0
        yv = yw - y_off

        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v
        for idx, ch in ((0, r), (1, g), (2, b)):
            out_ref[0, idx] = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)

    dh_pad = ((DH + tile - 1) // tile) * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b, ys, cs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b, ys, cs: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((rows, W), cdt),    # whole-frame bf16
            pltpu.VMEM((dh_pad, W), cdt),  # yh
            pltpu.VMEM((dh_pad, W), cdt),  # ch
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(y_starts), jnp.asarray(c_starts), nv12,
      jnp.asarray(y_blocks), jnp.asarray(c_blocks), wyw, wcw_i, wcw_half)


# ---- timing (same two-point slope as bench.py) --------------------------

def time_fn(fn, x, K=(8, 40), reps=5, slopes=3):
    def make(Kn):
        @jax.jit
        def run(xx):
            def body(k, carry):
                acc, a = carry
                patch = (k % 199 + 1).astype(jnp.uint8).reshape(1, 1, 1)
                a = jax.lax.dynamic_update_slice(a, patch, (0, 0, 0))
                # consume only a lane-tile slice: a pallas_call cannot
                # be partially DCE'd, and a full-output sum would add a
                # per-link HBM read of the whole result (0.5 ms for a
                # 400 MB packed-RGB batch) to the measured slope
                out = fn(a)
                return (acc + jnp.sum(out[..., :128].astype(jnp.int32)),
                        a)
            acc, _ = jax.lax.fori_loop(0, Kn, body, (jnp.int32(0), xx))
            return acc
        return run

    fns = {Kn: make(Kn) for Kn in K}
    for f in fns.values():
        float(f(x))
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
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2 + pad, W), dtype=np.uint8))

    variants = sys.argv[1:] or ["A", "B", "C", "D"]
    ref = None
    for v in variants:
        if v == "A":
            fn = lambda x: pallas_nv12_preprocess(
                x, src_w=W, src_h=H, dst_w=DW, dst_h=DH)
        else:
            fn = functools.partial(
                variant_kernel, src_w=W, src_h=H, dst_w=DW, dst_h=DH,
                variant=v)
        try:
            out = np.asarray(fn(nv12[:2]))
            if ref is None:
                ref = np.asarray(pallas_nv12_preprocess(
                    nv12[:2], src_w=W, src_h=H, dst_w=DW, dst_h=DH))
            diff = np.abs(out.astype(int) - ref.astype(int))
            ms, spread = time_fn(fn, nv12)
            print(f"{v}: {ms*1000:.3f} ms/batch  spread={spread:.1%}  "
                  f"maxdiff={diff.max()}  fps={B/ms:,.0f}", flush=True)
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()


def dma_floor(nv12, *, rows, W, DH, DW, interpret=False):
    """Floor: stream every input block through VMEM with trivial compute."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = nv12.shape[0]

    def kernel(frame_ref, out_ref):
        acc = frame_ref[0, :DH, :DW].astype(jnp.int32)
        acc += frame_ref[0, rows - DH:, :DW].astype(jnp.int32)
        for idx in range(3):
            out_ref[0, idx] = acc.astype(jnp.uint8)

    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv12)


def main_floor():
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    rows = H * 3 // 2 + pad
    nv12 = jnp.asarray(rng.integers(0, 256, (B, rows, W), dtype=np.uint8))
    fn = functools.partial(dma_floor, rows=rows, W=W, DH=DH, DW=DW)
    np.asarray(fn(nv12[:2]))
    ms, spread = time_fn(fn, nv12)
    gb = (nv12.nbytes + B * 3 * DH * DW) / ms / 1e9
    print(f"DMA floor: {ms*1000:.3f} ms/batch  spread={spread:.1%} "
          f"-> {gb:.0f} GB/s", flush=True)


def prod_like(nv12, *, src_w, src_h, dst_w, dst_h, mode="full", tile=TILE,
              space=ColorSpace.BT_709, crange=ColorRange.MPEG,
              interpret=False):
    """Production kernel structure with parts knocked out to attribute
    time: mode in {full, hpass (skip W+CSC), wpass (skip H loop)}."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    global TILE
    import vali_tpu.ops.pallas_fused as pf
    old_tile = pf.TILE
    pf.TILE = tile
    try:
        y_starts, y_blocks, y_win, y_end = pf._banded_h_weights(
            src_h, dst_h, LANCZOS_AA)
        c_starts, c_blocks, c_win, c_end = pf._banded_h_weights(
            src_h // 2, dst_h, LANCZOS_AA, row_offset=src_h,
            chroma_of=src_h)
    finally:
        pf.TILE = old_tile

    B = nv12.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    cdt = jnp.bfloat16
    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    wyw = jnp.asarray(_w_weights(W, DW, LANCZOS_AA)).astype(cdt)
    wcw = jnp.asarray(
        _chroma_w_weights_interleaved(W, DW, LANCZOS_AA)).astype(cdt)
    n_tiles = y_blocks.shape[0]
    m, y_off = colors.yuv2rgb_matrix(space, crange)
    m = m.astype(np.float32)

    def _to(x):
        return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)

    def kernel(ystart_ref, cstart_ref, frame_ref, yblk_ref, cblk_ref,
               wyw_ref, wcw_ref, out_ref, yh_ref, ch_ref):
        if mode != "wpass":
            def h_tile(t, _):
                ys = pl.multiple_of(ystart_ref[t], ALIGN)
                cs = pl.multiple_of(cstart_ref[t], ALIGN)
                yh_ref[pl.ds(t * tile, tile), :] = jnp.dot(
                    yblk_ref[t].astype(cdt), _to(frame_ref[0, pl.ds(ys, y_win), :]),
                    preferred_element_type=jnp.float32).astype(cdt)
                ch_ref[pl.ds(t * tile, tile), :] = jnp.dot(
                    cblk_ref[t].astype(cdt), _to(frame_ref[0, pl.ds(cs, c_win), :]),
                    preferred_element_type=jnp.float32).astype(cdt)
                return 0
            jax.lax.fori_loop(0, n_tiles, h_tile, 0)
        else:
            yh_ref[:DH, :] = _to(frame_ref[0, :DH, :])
            ch_ref[:DH, :] = _to(frame_ref[0, rows - DH:, :])

        if mode == "hpass":
            for idx in range(3):
                out_ref[0, idx] = jnp.clip(
                    jnp.round(yh_ref[:DH, :DW].astype(jnp.float32)
                              + ch_ref[:DH, :DW].astype(jnp.float32)),
                    0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)
            return

        yw = jnp.dot(yh_ref[:DH, :], wyw_ref[...],
                     preferred_element_type=jnp.float32)
        cw = jnp.dot(ch_ref[:DH, :], wcw_ref[...],
                     preferred_element_type=jnp.float32)
        u = cw[:, :DW] - 128.0
        v = cw[:, DW:] - 128.0
        yv = yw - y_off
        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v
        for idx, ch in ((0, r), (1, g), (2, b)):
            out_ref[0, idx] = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)

    dh_pad = ((DH + tile - 1) // tile) * tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b, ys, cs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b, ys, cs: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((max(dh_pad, DH), W), cdt),
            pltpu.VMEM((max(dh_pad, DH), W), cdt),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(y_starts), jnp.asarray(c_starts), nv12,
      jnp.asarray(y_blocks), jnp.asarray(c_blocks), wyw, wcw)


def main_modes():
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2 + pad, W), dtype=np.uint8))
    for mode, tile in (("full", 32), ("hpass", 32), ("wpass", 32),
                       ("full", 64), ("full", 16)):
        fn = functools.partial(prod_like, src_w=W, src_h=H, dst_w=DW,
                               dst_h=DH, mode=mode, tile=tile)
        try:
            np.asarray(fn(nv12[:2]))
            ms, spread = time_fn(fn, nv12)
            print(f"{mode} tile={tile}: {ms*1000:.3f} ms/batch "
                  f"spread={spread:.1%}", flush=True)
        except Exception as e:
            print(f"{mode} tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)




def grouped_kernel(nv12, *, src_w, src_h, dst_w, dst_h,
                   space=ColorSpace.BT_709, crange=ColorRange.MPEG,
                   interpret=False):
    """Variant G: H-pass as block-diagonal groups — 2 luma + 2 chroma
    32-row tiles in ONE [128, y2+y2+c+c] x [win, W] matmul (full MXU M)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = nv12.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    cdt = jnp.bfloat16
    tile = 32

    y_starts, y_blocks, y_win, y_end = _banded_h_weights(H, DH, LANCZOS_AA)
    c_starts, c_blocks, c_win, c_end = _banded_h_weights(
        H // 2, DH, LANCZOS_AA, row_offset=H, chroma_of=H)
    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    n_tiles = y_blocks.shape[0]
    groups = (n_tiles + 1) // 2
    gwin = 2 * y_win + 2 * c_win

    gblk = np.zeros((groups, 128, gwin), dtype=np.float32)
    gys = np.zeros((groups, 2), np.int32)
    gcs = np.zeros((groups, 2), np.int32)
    for g in range(groups):
        for j in range(2):
            t = 2 * g + j
            tt = min(t, n_tiles - 1)
            gys[g, j] = y_starts[tt]
            gcs[g, j] = c_starts[tt]
            if t < n_tiles:
                gblk[g, 32 * j:32 * (j + 1),
                     y_win * j:y_win * (j + 1)] = y_blocks[t]
                gblk[g, 64 + 32 * j:64 + 32 * (j + 1),
                     2 * y_win + c_win * j:2 * y_win + c_win * (j + 1)] = \
                    c_blocks[t]

    wyw = jnp.asarray(_w_weights(W, DW, LANCZOS_AA)).astype(cdt)
    wcw = jnp.asarray(
        _chroma_w_weights_interleaved(W, DW, LANCZOS_AA)).astype(cdt)
    m, y_off = colors.yuv2rgb_matrix(space, crange)
    m = m.astype(np.float32)

    def _to(x):
        return x.astype(jnp.int32).astype(cdt)

    def kernel(gys_ref, gcs_ref, frame_ref, gblk_ref, wyw_ref, wcw_ref,
               out_ref, win_ref, yh_ref, ch_ref):
        def group(g, _):
            ys0 = pl.multiple_of(gys_ref[g, 0], ALIGN)
            ys1 = pl.multiple_of(gys_ref[g, 1], ALIGN)
            cs0 = pl.multiple_of(gcs_ref[g, 0], ALIGN)
            cs1 = pl.multiple_of(gcs_ref[g, 1], ALIGN)
            win_ref[pl.ds(0, y_win), :] = _to(
                frame_ref[0, pl.ds(ys0, y_win), :])
            win_ref[pl.ds(y_win, y_win), :] = _to(
                frame_ref[0, pl.ds(ys1, y_win), :])
            win_ref[pl.ds(2 * y_win, c_win), :] = _to(
                frame_ref[0, pl.ds(cs0, c_win), :])
            win_ref[pl.ds(2 * y_win + c_win, c_win), :] = _to(
                frame_ref[0, pl.ds(cs1, c_win), :])
            res = jnp.dot(gblk_ref[g].astype(cdt), win_ref[...],
                          preferred_element_type=jnp.float32).astype(cdt)
            yh_ref[pl.ds(g * 64, 64), :] = res[0:64]
            ch_ref[pl.ds(g * 64, 64), :] = res[64:128]
            return 0

        jax.lax.fori_loop(0, groups, group, 0)

        yw = jnp.dot(yh_ref[:DH, :], wyw_ref[...],
                     preferred_element_type=jnp.float32)
        cw = jnp.dot(ch_ref[:DH, :], wcw_ref[...],
                     preferred_element_type=jnp.float32)
        u = cw[:, :DW] - 128.0
        v = cw[:, DW:] - 128.0
        yv = yw - y_off
        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g_ = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v
        for idx, ch in ((0, r), (1, g_), (2, b)):
            out_ref[0, idx] = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)

    dh_pad = groups * 64
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b, ys, cs: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b, ys, cs: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((gwin, W), cdt),
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dh_pad, W), cdt),
        ],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray(gys), jnp.asarray(gcs), nv12, jnp.asarray(gblk), wyw, wcw)


def main_grouped():
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2 + pad, W), dtype=np.uint8))
    fn = functools.partial(grouped_kernel, src_w=W, src_h=H, dst_w=DW,
                           dst_h=DH)
    ref = np.asarray(pallas_nv12_preprocess(
        nv12[:2], src_w=W, src_h=H, dst_w=DW, dst_h=DH))
    out = np.asarray(fn(nv12[:2]))
    print("maxdiff:", np.abs(out.astype(int) - ref.astype(int)).max(),
          flush=True)
    ms, spread = time_fn(fn, nv12)
    print(f"grouped G: {ms*1000:.3f} ms/batch spread={spread:.1%}",
          flush=True)


def static_kernel(nv12, *, src_w, src_h, dst_w, dst_h,
                  space=ColorSpace.BT_709, crange=ColorRange.MPEG,
                  shortchain=True, interpret=False):
    """Variant S: window starts are host constants — unroll the tile loop
    with STATIC slices (no scalar prefetch, no dynamic-shift machinery)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = nv12.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    cdt = jnp.bfloat16
    tile = 32

    y_starts, y_blocks, y_win, y_end = _banded_h_weights(H, DH, LANCZOS_AA)
    c_starts, c_blocks, c_win, c_end = _banded_h_weights(
        H // 2, DH, LANCZOS_AA, row_offset=H, chroma_of=H)
    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    n_tiles = y_blocks.shape[0]
    wyw = jnp.asarray(_w_weights(W, DW, LANCZOS_AA)).astype(cdt)
    wcw = jnp.asarray(
        _chroma_w_weights_interleaved(W, DW, LANCZOS_AA)).astype(cdt)
    m, y_off = colors.yuv2rgb_matrix(space, crange)
    m = m.astype(np.float32)

    def _to(x):
        if shortchain:
            return x.astype(jnp.int32).astype(cdt)
        return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)

    def kernel(frame_ref, yblk_ref, cblk_ref, wyw_ref, wcw_ref,
               out_ref, yh_ref, ch_ref):
        for t in range(n_tiles):
            ys = int(y_starts[t])
            cs = int(c_starts[t])
            yh_ref[t * tile:(t + 1) * tile, :] = jnp.dot(
                yblk_ref[t].astype(cdt),
                _to(frame_ref[0, ys:ys + y_win, :]),
                preferred_element_type=jnp.float32).astype(cdt)
            ch_ref[t * tile:(t + 1) * tile, :] = jnp.dot(
                cblk_ref[t].astype(cdt),
                _to(frame_ref[0, cs:cs + c_win, :]),
                preferred_element_type=jnp.float32).astype(cdt)

        yw = jnp.dot(yh_ref[:DH, :], wyw_ref[...],
                     preferred_element_type=jnp.float32)
        cw = jnp.dot(ch_ref[:DH, :], wcw_ref[...],
                     preferred_element_type=jnp.float32)
        u = cw[:, :DW] - 128.0
        v = cw[:, DW:] - 128.0
        yv = yw - y_off
        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v
        for idx, ch in ((0, r), (1, g), (2, b)):
            out_ref[0, idx] = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)

    dh_pad = ((DH + tile - 1) // tile) * tile
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dh_pad, W), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks), wyw, wcw)


def main_static():
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2 + pad, W), dtype=np.uint8))
    ref = np.asarray(pallas_nv12_preprocess(
        nv12[:2], src_w=W, src_h=H, dst_w=DW, dst_h=DH))
    for sc in (True, False):
        fn = functools.partial(static_kernel, src_w=W, src_h=H, dst_w=DW,
                               dst_h=DH, shortchain=sc)
        out = np.asarray(fn(nv12[:2]))
        md = np.abs(out.astype(int) - ref.astype(int)).max()
        ms, spread = time_fn(fn, nv12)
        print(f"static shortchain={sc}: {ms*1000:.3f} ms/batch "
              f"spread={spread:.1%} maxdiff={md}", flush=True)


def static_kernel2(nv12, *, src_w, src_h, dst_w, dst_h, tile=32, align=8,
                   space=ColorSpace.BT_709, crange=ColorRange.MPEG,
                   interpret=False):
    """Variant S2: static windows + tunable tile/align (smaller windows)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import vali_tpu.ops.pallas_fused as pf

    B = nv12.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    cdt = jnp.bfloat16

    ot, oa = pf.TILE, pf.ALIGN
    pf.TILE, pf.ALIGN = tile, align
    try:
        y_starts, y_blocks, y_win, y_end = pf._banded_h_weights(
            H, DH, LANCZOS_AA)
        c_starts, c_blocks, c_win, c_end = pf._banded_h_weights(
            H // 2, DH, LANCZOS_AA, row_offset=H, chroma_of=H)
    finally:
        pf.TILE, pf.ALIGN = ot, oa

    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    n_tiles = y_blocks.shape[0]
    wyw = jnp.asarray(_w_weights(W, DW, LANCZOS_AA)).astype(cdt)
    wcw = jnp.asarray(
        _chroma_w_weights_interleaved(W, DW, LANCZOS_AA)).astype(cdt)
    m, y_off = colors.yuv2rgb_matrix(space, crange)
    m = m.astype(np.float32)

    def _to(x):
        return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)

    def kernel(frame_ref, yblk_ref, cblk_ref, wyw_ref, wcw_ref,
               out_ref, yh_ref, ch_ref):
        for t in range(n_tiles):
            ys, cs = int(y_starts[t]), int(c_starts[t])
            yh_ref[t * tile:(t + 1) * tile, :] = jnp.dot(
                yblk_ref[t].astype(cdt),
                _to(frame_ref[0, ys:ys + y_win, :]),
                preferred_element_type=jnp.float32).astype(cdt)
            ch_ref[t * tile:(t + 1) * tile, :] = jnp.dot(
                cblk_ref[t].astype(cdt),
                _to(frame_ref[0, cs:cs + c_win, :]),
                preferred_element_type=jnp.float32).astype(cdt)

        yw = jnp.dot(yh_ref[:DH, :], wyw_ref[...],
                     preferred_element_type=jnp.float32)
        cw = jnp.dot(ch_ref[:DH, :], wcw_ref[...],
                     preferred_element_type=jnp.float32)
        u = cw[:, :DW] - 128.0
        v = cw[:, DW:] - 128.0
        yv = yw - y_off
        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v
        for idx, ch in ((0, r), (1, g), (2, b)):
            out_ref[0, idx] = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)

    dh_pad = ((DH + tile - 1) // tile) * tile
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dh_pad, W), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks), wyw, wcw)


def main_sweep2():
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)   # conservative (align-32 version)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2 + pad, W), dtype=np.uint8))
    ref = np.asarray(pallas_nv12_preprocess(
        nv12[:2], src_w=W, src_h=H, dst_w=DW, dst_h=DH))
    for tile, align in ((32, 8), (16, 8), (24, 8), (48, 8), (32, 32)):
        fn = functools.partial(static_kernel2, src_w=W, src_h=H, dst_w=DW,
                               dst_h=DH, tile=tile, align=align)
        try:
            out = np.asarray(fn(nv12[:2]))
            md = np.abs(out.astype(int) - ref.astype(int)).max()
            ms, spread = time_fn(fn, nv12)
            print(f"S2 tile={tile} align={align}: {ms*1000:.3f} ms "
                  f"spread={spread:.1%} maxdiff={md}", flush=True)
        except Exception as e:
            print(f"S2 tile={tile} align={align}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


def multiframe_kernel(nv12, *, src_w, src_h, dst_w, dst_h, gframes=4,
                      tile=32, align=8, space=ColorSpace.BT_709,
                      crange=ColorRange.MPEG, interpret=False):
    """Variant M4: G frames per grid step; one W-pass matmul over the
    stacked [G*DH, W] H-pass output (M = exact multiple of 128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import vali_tpu.ops.pallas_fused as pf

    B = nv12.shape[0]
    G = gframes
    assert B % G == 0
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    cdt = jnp.bfloat16

    ot, oa = pf.TILE, pf.ALIGN
    pf.TILE, pf.ALIGN = tile, align
    try:
        y_starts, y_blocks, y_win, y_end = pf._banded_h_weights(
            H, DH, LANCZOS_AA)
        c_starts, c_blocks, c_win, c_end = pf._banded_h_weights(
            H // 2, DH, LANCZOS_AA, row_offset=H, chroma_of=H)
    finally:
        pf.TILE, pf.ALIGN = ot, oa

    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    n_tiles = y_blocks.shape[0]
    wyw = jnp.asarray(_w_weights(W, DW, LANCZOS_AA)).astype(cdt)
    wcw = jnp.asarray(
        _chroma_w_weights_interleaved(W, DW, LANCZOS_AA)).astype(cdt)
    m, y_off = colors.yuv2rgb_matrix(space, crange)
    m = m.astype(np.float32)
    dh_pad = ((DH + tile - 1) // tile) * tile

    def _to(x):
        return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)

    def kernel(frame_ref, yblk_ref, cblk_ref, wyw_ref, wcw_ref,
               out_ref, yh_ref, ch_ref):
        for gi in range(G):
            for t in range(n_tiles):
                ys, cs = int(y_starts[t]), int(c_starts[t])
                r0 = gi * dh_pad + t * tile
                yh_ref[r0:r0 + tile, :] = jnp.dot(
                    yblk_ref[t].astype(cdt),
                    _to(frame_ref[gi, ys:ys + y_win, :]),
                    preferred_element_type=jnp.float32).astype(cdt)
                ch_ref[r0:r0 + tile, :] = jnp.dot(
                    cblk_ref[t].astype(cdt),
                    _to(frame_ref[gi, cs:cs + c_win, :]),
                    preferred_element_type=jnp.float32).astype(cdt)

        yw = jnp.dot(yh_ref[...], wyw_ref[...],
                     preferred_element_type=jnp.float32)  # [G*dh_pad, DW]
        cw = jnp.dot(ch_ref[...], wcw_ref[...],
                     preferred_element_type=jnp.float32)  # [G*dh_pad, 2DW]
        u = cw[:, :DW] - 128.0
        v = cw[:, DW:] - 128.0
        yv = yw - y_off
        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v
        for gi in range(G):
            s = gi * dh_pad
            for idx, ch in ((0, r), (1, g), (2, b)):
                out_ref[gi, idx] = jnp.clip(
                    jnp.round(ch[s:s + DH]), 0.0, 255.0).astype(
                    jnp.int32).astype(jnp.uint8)

    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((G * dh_pad, W), cdt),
            pltpu.VMEM((G * dh_pad, W), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks), wyw, wcw)


def main_multiframe():
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2 + pad, W), dtype=np.uint8))
    ref = np.asarray(pallas_nv12_preprocess(
        nv12[:4], src_w=W, src_h=H, dst_w=DW, dst_h=DH))
    for G in (2, 4, 8):
        fn = functools.partial(multiframe_kernel, src_w=W, src_h=H,
                               dst_w=DW, dst_h=DH, gframes=G)
        try:
            out = np.asarray(fn(nv12[:4 if G <= 4 else 8]))
            md = np.abs(out[:4].astype(int) - ref.astype(int)).max()
            ms, spread = time_fn(fn, nv12)
            print(f"M{G}: {ms*1000:.3f} ms spread={spread:.1%} "
                  f"maxdiff={md}", flush=True)
        except Exception as e:
            print(f"M{G}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


def transposed_chroma_kernel(nv12, *, src_w, src_h, dst_w, dst_h,
                             space=ColorSpace.BT_709,
                             crange=ColorRange.MPEG, interpret=False):
    """Variant T: deinterleave chroma by transposing ch to [W, DH] and
    slicing even/odd SUBLANES (cheap), then half-contraction W-passes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import vali_tpu.ops.pallas_fused as pf

    B = nv12.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    cdt = jnp.bfloat16
    tile = 32

    y_starts, y_blocks, y_win, y_end = pf._banded_h_weights(H, DH, LANCZOS_AA)
    c_starts, c_blocks, c_win, c_end = pf._banded_h_weights(
        H // 2, DH, LANCZOS_AA, row_offset=H, chroma_of=H)
    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    n_tiles = y_blocks.shape[0]
    wyw = jnp.asarray(_w_weights(W, DW, LANCZOS_AA)).astype(cdt)
    # half-contraction chroma weights, transposed: [DW, W/2]
    wcw_full = _chroma_w_weights_interleaved(W, DW, LANCZOS_AA)
    wcw_half_t = jnp.asarray(wcw_full[0::2, :DW].T.copy()).astype(cdt)
    m, y_off = colors.yuv2rgb_matrix(space, crange)
    m = m.astype(np.float32)

    def _to(x):
        return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)

    def kernel(frame_ref, yblk_ref, cblk_ref, wyw_ref, wcwht_ref,
               out_ref, yh_ref, ch_ref):
        for t in range(n_tiles):
            ys, cs = int(y_starts[t]), int(c_starts[t])
            yh_ref[t * tile:(t + 1) * tile, :] = jnp.dot(
                yblk_ref[t].astype(cdt),
                _to(frame_ref[0, ys:ys + y_win, :]),
                preferred_element_type=jnp.float32).astype(cdt)
            ch_ref[t * tile:(t + 1) * tile, :] = jnp.dot(
                cblk_ref[t].astype(cdt),
                _to(frame_ref[0, cs:cs + c_win, :]),
                preferred_element_type=jnp.float32).astype(cdt)

        yw = jnp.dot(yh_ref[:DH, :], wyw_ref[...],
                     preferred_element_type=jnp.float32)      # [DH, DW]
        ch_t = jnp.transpose(ch_ref[:DH, :])                  # [W, DH]
        ch3 = ch_t.reshape(W // 2, 2, DH)
        u_t = ch3[:, 0, :]                                    # [W/2, DH]
        v_t = ch3[:, 1, :]
        u_dw = jnp.dot(wcwht_ref[...], u_t,
                       preferred_element_type=jnp.float32)    # [DW, DH]
        v_dw = jnp.dot(wcwht_ref[...], v_t,
                       preferred_element_type=jnp.float32)
        u = jnp.transpose(u_dw) - 128.0                       # [DH, DW]
        v = jnp.transpose(v_dw) - 128.0
        yv = yw - y_off
        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v
        for idx, ch in ((0, r), (1, g), (2, b)):
            out_ref[0, idx] = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)

    dh_pad = ((DH + tile - 1) // tile) * tile
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dh_pad, W), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks), wyw, wcw_half_t)


def main_transposed():
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2 + pad, W), dtype=np.uint8))
    fn = functools.partial(transposed_chroma_kernel, src_w=W, src_h=H,
                           dst_w=DW, dst_h=DH)
    try:
        ref = np.asarray(pallas_nv12_preprocess(
            nv12[:2], src_w=W, src_h=H, dst_w=DW, dst_h=DH))
        out = np.asarray(fn(nv12[:2]))
        md = np.abs(out.astype(int) - ref.astype(int)).max()
        ms, spread = time_fn(fn, nv12)
        print(f"T: {ms*1000:.3f} ms spread={spread:.1%} maxdiff={md}",
              flush=True)
    except Exception as e:
        print(f"T: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)


def combo_kernel(nv12, *, src_w, src_h, dst_w, dst_h, gframes=2,
                 tile=32, space=ColorSpace.BT_709,
                 crange=ColorRange.MPEG, interpret=False):
    """Variant COMBO (round 3): multiframe G grid steps ON TOP OF the
    current production structure — static windows, banded W-pass,
    chroma W halves padded per lane tile, u8->i16->bf16 cast. The round-2
    lab measured M2 winning (0.431 vs 0.516) under the OLD dense-W
    dynamic-slice structure; this retries it against the 0.33 ms
    static+banded kernel. M in the W-pass matmuls becomes G*DH."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import vali_tpu.ops.pallas_fused as pf

    B = nv12.shape[0]
    G = gframes
    assert B % G == 0
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    cdt = jnp.bfloat16
    method = LANCZOS_AA

    ot = pf.TILE
    pf.TILE = tile
    try:
        y_starts, y_blocks, y_win, y_end = pf._banded_h_weights(
            H, DH, method)
        c_starts, c_blocks, c_win, c_end = pf._banded_h_weights(
            H // 2, DH, method, row_offset=H, chroma_of=H)
    finally:
        pf.TILE = ot
    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    n_tiles = y_blocks.shape[0]

    LT, LA = pf.LANE_TILE, pf.LANE_ALIGN
    wys, wyb, wy_winw, _ = pf._banded_blocks_from_dense(
        _w_weights(W, DW, method).T, LT, LA, W, clamp_to_extent=True)
    wy_blocks = np.transpose(wyb, (0, 2, 1)).copy()
    DWp = ((DW + LT - 1) // LT) * LT
    _wc = _chroma_w_weights_interleaved(W, DW, method)
    wc_dense = np.zeros((W, 2 * DWp), dtype=np.float32)
    wc_dense[:, :DW] = _wc[:, :DW]
    wc_dense[:, DWp:DWp + DW] = _wc[:, DW:]
    wcs, wcb, wc_winw, _ = pf._banded_blocks_from_dense(
        wc_dense.T, LT, LA, W, clamp_to_extent=True)
    wc_blocks = np.transpose(wcb, (0, 2, 1)).copy()
    nwt, nct_w = wy_blocks.shape[0], wc_blocks.shape[0]

    mo = colors.yuv2rgb_matrix(space, crange)
    m, y_off = mo
    m = m.astype(np.float32)
    dh_pad = ((DH + tile - 1) // tile) * tile
    GDH = G * dh_pad

    def _to(x):
        return x.astype(jnp.int16).astype(cdt)

    def kernel(frame_ref, yblk_ref, cblk_ref, wyb_ref, wcb_ref, out_ref,
               yh_ref, ch_ref, yw_ref, cw_ref):
        for gi in range(G):
            for t in range(n_tiles):
                ys, cs = int(y_starts[t]), int(c_starts[t])
                r0 = gi * dh_pad + t * tile
                yh_ref[r0:r0 + tile, :] = jnp.dot(
                    yblk_ref[t].astype(cdt),
                    _to(frame_ref[gi, ys:ys + y_win, :]),
                    preferred_element_type=jnp.float32).astype(cdt)
                ch_ref[r0:r0 + tile, :] = jnp.dot(
                    cblk_ref[t].astype(cdt),
                    _to(frame_ref[gi, cs:cs + c_win, :]),
                    preferred_element_type=jnp.float32).astype(cdt)

        # banded W pass, M = G*dh_pad rows at once
        for t in range(nwt):
            ws = int(wys[t])
            yw_ref[:, t * LT:(t + 1) * LT] = jnp.dot(
                yh_ref[:, ws:ws + wy_winw], wyb_ref[t].astype(cdt),
                preferred_element_type=jnp.float32)
        for t in range(nct_w):
            ws = int(wcs[t])
            cw_ref[:, t * LT:(t + 1) * LT] = jnp.dot(
                ch_ref[:, ws:ws + wc_winw], wcb_ref[t].astype(cdt),
                preferred_element_type=jnp.float32)
        u = cw_ref[:, :DW] - 128.0
        v = cw_ref[:, DWp:DWp + DW] - 128.0
        yv = yw_ref[:, :DW] - y_off
        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v
        for gi in range(G):
            s = gi * dh_pad
            for idx, ch in ((0, r), (1, g), (2, b)):
                out_ref[gi, idx] = jnp.clip(
                    jnp.round(ch[s:s + DH]), 0.0, 255.0).astype(
                    jnp.int32).astype(jnp.uint8)

    return pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[
            pl.BlockSpec((G, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), jnp.uint8),
        scratch_shapes=[
            pltpu.VMEM((GDH, W), cdt),
            pltpu.VMEM((GDH, W), cdt),
            pltpu.VMEM((GDH, nwt * LT), jnp.float32),
            pltpu.VMEM((GDH, nct_w * LT), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks).astype(cdt), jnp.asarray(wc_blocks).astype(cdt))


def main_combo():
    """Round-3 item: M2 grid steps + static windows + banded W (VERDICT
    #3) and a TILE re-sweep under the current structure."""
    B, H, W, DH, DW = 64, 1080, 1920, 224, 224
    rng = np.random.default_rng(0)
    pad = required_pad_rows(W, H, DH)
    nv12 = jnp.asarray(
        rng.integers(0, 256, (B, H * 3 // 2 + pad, W), dtype=np.uint8))
    base = lambda x: pallas_nv12_preprocess(
        x, src_w=W, src_h=H, dst_w=DW, dst_h=DH)
    ref = np.asarray(base(nv12[:4]))
    ms, spread = time_fn(base, nv12)
    print(f"base(prod): {ms*1000:.3f} ms spread={spread:.1%}", flush=True)
    cases = [(2, 32), (4, 32), (2, 64), (1, 64)]
    import sys as _sys
    if _sys.argv[1:]:
        cases = [tuple(int(v) for v in a.split(",")) for a in _sys.argv[1:]]
    for G, tile in cases:
        fn = functools.partial(combo_kernel, src_w=W, src_h=H,
                               dst_w=DW, dst_h=DH, gframes=G, tile=tile)
        try:
            out = np.asarray(fn(nv12[:4]))
            md = np.abs(out.astype(int) - ref.astype(int)).max()
            ms, spread = time_fn(fn, nv12)
            print(f"COMBO G={G} tile={tile}: {ms*1000:.3f} ms "
                  f"spread={spread:.1%} maxdiff={md}", flush=True)
        except Exception as e:
            print(f"COMBO G={G} tile={tile}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
