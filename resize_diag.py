"""Lab notebook: where do the 4K resize kernel's us/frame go?

Measured (v5e, 16x4K->1080p, bench.py's min-slope estimator):

  dma_only  (whole-frame VMEM block, no compute)   23.3 us/frame
  h_only    (+ banded H dots)                      23.6
  w_only    (+ banded W dots, no H)                24.1
  both (luma only)                                 26.0
  full production (incl. chroma W + 2 outputs)     32.7
  streamed band=256 (manual async band copies,     43.2  <- dead end
    frame in HBM, double-buffered DMA ring)
  streamed band=512                                42.6

Round-3 re-analysis: the "input-DMA-bound" read above was only true of
h_only — the FULL kernel was MXU-bound: at the old (32, 128) window
alignment the per-frame MACs were 4.8 GFLOP (24 us at v5e bf16 peak),
over half of it alignment slack (H win 128 rows for a ~76-row Lanczos
support, W win 512 lanes for ~262). Measured fixes and dead ends:

  aligned h=8  w=32  (3.1 GFLOP)                   29.1 us/frame  maxdiff=0
  aligned h=4  w=32                                28.0
  aligned h=8  w=64                                28.7-29.0
  aligned h=8  w=16 / h=16 w=32 / h=32 w=32        29.6 / 29.7 / 33.3
  striped nw=2/3/5/6 (W-stripe grid; input DMA     38.8-44.0  <- dead end
    in 2-6 MB stripe blocks; dyn/unroll/relay
    stores all equivalent; stripes pay strided
    row segments and save zero MACs)
  slabs n=2/4/6 (same array as n in_specs with     28.8-30.7  <- dead end
    row-offset blocks for concurrent input DMAs;
    no faster than plain aligned — Mosaic already
    pipelines the single large fetch)

ADOPTED: h_align=8, w_align=32 production defaults (bit-identical, all
maxdiff=0), plus clamp-over-pad row windows (_row_blocks_fit) so
unpadded callers skip a 400 MB device-side jnp.pad copy. After the
time_fn fix (sum a 128-lane slice, not the whole output — the full
reduce added ~3 us/frame of harness tax here) production measures
25.2 us/frame padded / 26.3 unpadded = ~39.7k fps/chip, vs 29.5k at
round 2. Remaining gap to the ~19 us input-stream floor is the W-pass
serializing after the H-pass within a grid step.

  skewed (software-pipelined grid: step b does    29.5  <- dead end
    frame b's H-pass + frame b-1's W-pass from a
    double-buffered H scratch; vs prod 29.4 same
    estimator, maxdiff=0): no win — at (8, 32)
    alignment the MXU work is already hidden
    behind the input DMA, so de-serializing the
    two passes moves nothing."""
import functools
import numpy as np
import jax
import jax.numpy as jnp

from vali_tpu.ops.pallas_fused import (
    ALIGN, LANE_ALIGN, LANE_TILE, TILE, _banded_blocks_from_dense,
    _interleave_w_blocks, pallas_nv12_resize, required_pad_rows_resize)
from vali_tpu.ops.resize import resize_weights
from bench import _time_kernel

H, W, DH, DW = 2160, 3840, 1080, 1920
B = 16
DC = DH // 2


@functools.partial(jax.jit, static_argnames=("mode",))
def variant(nv12, *, mode="h_only"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn = nv12.shape[0]
    wy_rows = resize_weights(H, DH, "lanczos_aa")
    wc_rows = resize_weights(H // 2, DC, "lanczos_aa")
    y_starts, y_blocks, y_win, y_end = _banded_blocks_from_dense(
        wy_rows, TILE, ALIGN, H * 3 // 2)
    c_starts, c_blocks, c_win, c_end = _banded_blocks_from_dense(
        wc_rows, TILE, ALIGN, H * 3 // 2, row_offset=H)
    rows = nv12.shape[1]
    nyt, nct = y_blocks.shape[0], c_blocks.shape[0]

    wy_cols = resize_weights(W, DW, "lanczos_aa")
    s_, b_, wy_winw, _ = _banded_blocks_from_dense(
        wy_cols, LANE_TILE, LANE_ALIGN, W, clamp_to_extent=True)
    wy_starts, wy_blocks = s_, np.transpose(b_, (0, 2, 1)).copy()
    nwt = wy_blocks.shape[0]
    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    dc_pad = ((DC + TILE - 1) // TILE) * TILE
    dwp = nwt * LANE_TILE

    def kernel(frame_ref, yblk_ref, cblk_ref, wyb_ref, yout_ref,
               yh_ref, ch_ref):
        if mode in ("h_only", "both"):
            for t in range(nyt):
                ys = int(y_starts[t])
                yh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                    yblk_ref[t].astype(jnp.bfloat16),
                    frame_ref[0, ys:ys + y_win, :].astype(
                        jnp.int16).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            for t in range(nct):
                cs = int(c_starts[t])
                ch_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                    cblk_ref[t].astype(jnp.bfloat16),
                    frame_ref[0, cs:cs + c_win, :].astype(
                        jnp.int16).astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        else:  # dma_only touch
            yh_ref[0:TILE, :] = frame_ref[0, 0:TILE, :].astype(
                jnp.int16).astype(jnp.bfloat16)
            ch_ref[0:TILE, :] = frame_ref[0, H:H + TILE, :].astype(
                jnp.int16).astype(jnp.bfloat16)
        if mode in ("w_only", "both"):
            for t in range(nwt):
                ws = int(wy_starts[t])
                acc = jnp.dot(yh_ref[:DH, ws:ws + wy_winw],
                              wyb_ref[t].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
                yout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = \
                    jnp.clip(jnp.round(acc), 0.0, 255.0).astype(
                        jnp.int32).astype(jnp.uint8)
        else:
            yout_ref[0, :, 0:LANE_TILE] = yh_ref[:DH, 0:LANE_TILE].astype(
                jnp.int32).astype(jnp.uint8)

    return pl.pallas_call(
        kernel,
        grid=(Bn,),
        in_specs=[pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, DH, dwp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((dh_pad, W), jnp.bfloat16),
                        pltpu.VMEM((dc_pad, W), jnp.bfloat16)],
        out_shape=jax.ShapeDtypeStruct((Bn, DH, dwp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks))


def main():
    rng = np.random.default_rng(0)
    pad = required_pad_rows_resize(W, H, DW, DH)
    nv12 = np.zeros((B, H * 3 // 2 + pad, W), np.uint8)
    nv12[:, :H * 3 // 2] = rng.integers(0, 256, (B, H * 3 // 2, W),
                                        dtype=np.uint8)
    x = jnp.asarray(nv12)
    for mode in ("dma_only", "h_only", "w_only", "both"):
        fn = lambda a, m=mode: variant(a, mode=m)
        np.asarray(jax.jit(fn)(x[:2]))
        ms, spread = _time_kernel(fn, x)
        print(f"{mode:9s}: {ms*1000:.3f} ms/{B} = {ms/B*1e6:.1f} us/frame "
              f"spread={spread:.1%}", flush=True)
    fnp = lambda a: pallas_nv12_resize(a, src_w=W, src_h=H, dst_w=DW,
                                       dst_h=DH)
    ms, spread = _time_kernel(fnp, x)
    print(f"full prod : {ms*1000:.3f} ms/{B} = {ms/B*1e6:.1f} us/frame "
          f"spread={spread:.1%}", flush=True)




@functools.partial(jax.jit, static_argnames=("band",))
def streamed(nv12, *, band=256):
    """Input stays in HBM; the kernel streams row-bands into VMEM with
    double-buffered async copies overlapped against the H-pass dots."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn, rows, _ = nv12.shape
    wy_rows = resize_weights(H, DH, "lanczos_aa")
    wc_rows = resize_weights(H // 2, DC, "lanczos_aa")
    y_starts, y_blocks, y_win, _ = _banded_blocks_from_dense(
        wy_rows, TILE, ALIGN, rows)
    c_starts, c_blocks, c_win, _ = _banded_blocks_from_dense(
        wc_rows, TILE, ALIGN, rows, row_offset=H)
    nyt, nct = y_blocks.shape[0], c_blocks.shape[0]

    wy_cols = resize_weights(W, DW, "lanczos_aa")
    s_, b_, wy_winw, _ = _banded_blocks_from_dense(
        wy_cols, LANE_TILE, LANE_ALIGN, W, clamp_to_extent=True)
    wy_starts, wy_blocks = s_, np.transpose(b_, (0, 2, 1)).copy()
    nwt = wy_blocks.shape[0]
    wc_cols = resize_weights(W // 2, DW // 2, "lanczos_aa")
    wc_starts, wc_b, wc_winw = _interleave_w_blocks(
        wc_cols, W, DW, LANE_TILE, LANE_ALIGN)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    dc_pad = ((DC + TILE - 1) // TILE) * TILE
    dwp = nwt * LANE_TILE
    n_bands = (rows + band - 1) // band

    # tiles in the order their windows complete, tagged with the last
    # band each needs (all static)
    tiles = ([("y", t, int(y_starts[t]), y_win) for t in range(nyt)] +
             [("c", t, int(c_starts[t]), c_win) for t in range(nct)])
    tiles.sort(key=lambda e: e[2] + e[3])

    def kernel(frame_hbm, yblk_ref, cblk_ref, wyb_ref, wcb_ref,
               yout_ref, cout_ref, fvm, yh_ref, ch_ref, sems):
        bidx = pl.program_id(0)

        def copy_band(i):
            lo = i * band
            n = min(band, rows - lo)
            return pltpu.make_async_copy(
                frame_hbm.at[bidx, pl.ds(lo, n), :],
                fvm.at[pl.ds(lo, n), :], sems.at[i])

        started = 0
        PREFETCH = 2
        for _ in range(min(PREFETCH, n_bands)):
            copy_band(started).start()
            started += 1
        waited = 0
        for kind, t, ts, win in tiles:
            need = min((ts + win - 1) // band, n_bands - 1)
            while waited <= need:
                copy_band(waited).wait()
                waited += 1
                if started < n_bands:
                    copy_band(started).start()
                    started += 1
            if kind == "y":
                yh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                    yblk_ref[t].astype(jnp.bfloat16),
                    fvm[ts:ts + win, :].astype(jnp.int16).astype(
                        jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            else:
                ch_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                    cblk_ref[t].astype(jnp.bfloat16),
                    fvm[ts:ts + win, :].astype(jnp.int16).astype(
                        jnp.bfloat16),
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        while waited < n_bands:
            copy_band(waited).wait()
            waited += 1

        for t in range(nwt):
            ws = int(wy_starts[t])
            acc = jnp.dot(yh_ref[:DH, ws:ws + wy_winw],
                          wyb_ref[t].astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
            yout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.clip(
                jnp.round(acc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)
            cs = int(wc_starts[t])
            accc = jnp.dot(ch_ref[:DC, cs:cs + wc_winw],
                           wcb_ref[t].astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
            cout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.clip(
                jnp.round(accc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    y_out, c_out = pl.pallas_call(
        kernel,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, DH, dwp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DC, dwp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, W), jnp.uint8),
            pltpu.VMEM((dh_pad, W), jnp.bfloat16),
            pltpu.VMEM((dc_pad, W), jnp.bfloat16),
            pltpu.SemaphoreType.DMA(((rows + band - 1) // band,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bn, DH, dwp), jnp.uint8),
            jax.ShapeDtypeStruct((Bn, DC, dwp), jnp.uint8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks), jnp.asarray(wc_b))
    return jnp.concatenate([y_out[:, :, :DW], c_out[:, :, :DW]], axis=1)


@functools.partial(jax.jit, static_argnames=("h_align", "w_align"))
def aligned(nv12, *, h_align=32, w_align=128):
    """Alignment sweep: the kernel is MXU-bound (H dots 16.3us + W dots
    12.3us vs 23.3us input DMA), and the banded windows carry dead MACs
    from alignment slack — H win 128 rows for a ~76-row Lanczos support,
    W win 384 lanes for ~262. Smaller aligns shrink the contraction if
    Mosaic tolerates the static unaligned slices."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn = nv12.shape[0]
    cdt = jnp.bfloat16
    wy_rows = resize_weights(H, DH, "lanczos_aa")
    wc_rows = resize_weights(H // 2, DC, "lanczos_aa")
    y_starts, y_blocks, y_win, y_end = _banded_blocks_from_dense(
        wy_rows, TILE, h_align, H * 3 // 2)
    c_starts, c_blocks, c_win, c_end = _banded_blocks_from_dense(
        wc_rows, TILE, h_align, H * 3 // 2, row_offset=H)
    rows = nv12.shape[1]
    nyt, nct = y_blocks.shape[0], c_blocks.shape[0]
    assert max(y_end, c_end) <= rows

    wy_cols = resize_weights(W, DW, "lanczos_aa")
    wc_cols = resize_weights(W // 2, DW // 2, "lanczos_aa")
    s_, b_, wy_winw, _ = _banded_blocks_from_dense(
        wy_cols, LANE_TILE, w_align, W, clamp_to_extent=True)
    wy_starts, wy_blocks = s_, np.transpose(b_, (0, 2, 1)).copy()
    nwt = wy_blocks.shape[0]
    wc_starts, wc_blocks, wc_winw = _interleave_w_blocks(
        wc_cols, W, DW, LANE_TILE, w_align)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    dc_pad = ((DC + TILE - 1) // TILE) * TILE
    dwp = nwt * LANE_TILE

    def kernel(frame_ref, yblk_ref, cblk_ref, wyb_ref, wcb_ref,
               yout_ref, cout_ref, yh_ref, ch_ref):
        for t in range(nyt):
            ys = int(y_starts[t])
            yh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                yblk_ref[t].astype(cdt),
                frame_ref[0, ys:ys + y_win, :].astype(jnp.int16).astype(
                    cdt),
                preferred_element_type=jnp.float32).astype(cdt)
        for t in range(nct):
            cs = int(c_starts[t])
            ch_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                cblk_ref[t].astype(cdt),
                frame_ref[0, cs:cs + c_win, :].astype(jnp.int16).astype(
                    cdt),
                preferred_element_type=jnp.float32).astype(cdt)
        for t in range(nwt):
            ws = int(wy_starts[t])
            acc = jnp.dot(yh_ref[:DH, ws:ws + wy_winw],
                          wyb_ref[t].astype(cdt),
                          preferred_element_type=jnp.float32)
            yout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.clip(
                jnp.round(acc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)
            cs = int(wc_starts[t])
            accc = jnp.dot(ch_ref[:DC, cs:cs + wc_winw],
                           wcb_ref[t].astype(cdt),
                           preferred_element_type=jnp.float32)
            cout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.clip(
                jnp.round(accc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    y_out, c_out = pl.pallas_call(
        kernel,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec((1, DH, dwp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DC, dwp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((dh_pad, W), cdt),
                        pltpu.VMEM((dc_pad, W), cdt)],
        out_shape=[jax.ShapeDtypeStruct((Bn, DH, dwp), jnp.uint8),
                   jax.ShapeDtypeStruct((Bn, DC, dwp), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks), jnp.asarray(wc_blocks))
    return jnp.concatenate([y_out[:, :, :DW], c_out[:, :, :DW]], axis=1)


def main_aligned():
    import sys
    rng = np.random.default_rng(0)
    pad = max(required_pad_rows_resize(W, H, DW, DH), 64)
    nv12 = np.zeros((B, H * 3 // 2 + pad, W), np.uint8)
    nv12[:, :H * 3 // 2] = rng.integers(0, 256, (B, H * 3 // 2, W),
                                        dtype=np.uint8)
    x = jnp.asarray(nv12)
    ref = np.asarray(jax.jit(lambda a: pallas_nv12_resize(
        a, src_w=W, src_h=H, dst_w=DW, dst_h=DH))(x[:2]))
    cases = [(8, 128), (16, 128), (32, 64), (8, 64), (32, 32)]
    if sys.argv[2:]:
        cases = [tuple(int(v) for v in a.split(",")) for a in sys.argv[2:]]
    for ha, wa in cases:
        fn = lambda a, h=ha, w=wa: aligned(a, h_align=h, w_align=w)
        try:
            out = np.asarray(jax.jit(fn)(x[:2]))
            d = np.abs(out.astype(int) - ref.astype(int)).max()
            ms, spread = _time_kernel(fn, x)
            print(f"aligned h={ha} w={wa}: {ms*1000:.3f} ms/{B} = "
                  f"{ms/B*1e6:.1f} us/frame spread={spread:.1%} "
                  f"maxdiff={d}", flush=True)
        except Exception as e:
            print(f"aligned h={ha} w={wa}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


@functools.partial(jax.jit, static_argnames=("h_align", "w_align"))
def skewed(nv12, *, h_align=8, w_align=32):
    """Software-pipelined grid: step b runs frame b's H-pass and frame
    b-1's W-pass (double-buffered H scratch), so the two MXU passes
    overlap across grid steps instead of serializing inside one. Step
    time should drop from DMA-vs-(H+W) to max(DMA, H, W)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn = nv12.shape[0]
    cdt = jnp.bfloat16
    wy_rows = resize_weights(H, DH, "lanczos_aa")
    wc_rows = resize_weights(H // 2, DC, "lanczos_aa")
    from vali_tpu.ops.pallas_fused import _row_blocks_fit
    y_starts, y_blocks, y_win, y_end = _row_blocks_fit(
        wy_rows, TILE, h_align, nv12.shape[1])
    c_starts, c_blocks, c_win, c_end = _row_blocks_fit(
        wc_rows, TILE, h_align, nv12.shape[1], row_offset=H)
    assert max(y_end, c_end) <= nv12.shape[1]
    rows = nv12.shape[1]
    nyt, nct = y_blocks.shape[0], c_blocks.shape[0]

    wy_cols = resize_weights(W, DW, "lanczos_aa")
    wc_cols = resize_weights(W // 2, DW // 2, "lanczos_aa")
    s_, b_, wy_winw, _ = _banded_blocks_from_dense(
        wy_cols, LANE_TILE, w_align, W, clamp_to_extent=True)
    wy_starts, wy_blocks = s_, np.transpose(b_, (0, 2, 1)).copy()
    nwt = wy_blocks.shape[0]
    wc_starts, wc_blocks, wc_winw = _interleave_w_blocks(
        wc_cols, W, DW, LANE_TILE, w_align)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    dc_pad = ((DC + TILE - 1) // TILE) * TILE
    dwp = nwt * LANE_TILE

    def kernel(frame_ref, yblk_ref, cblk_ref, wyb_ref, wcb_ref,
               yout_ref, cout_ref, yh_ref, ch_ref):
        s = pl.program_id(0)

        @pl.when(s < Bn)
        def _():
            buf = s % 2
            for t in range(nyt):
                ys = int(y_starts[t])
                yh_ref[buf, t * TILE:(t + 1) * TILE, :] = jnp.dot(
                    yblk_ref[t].astype(cdt),
                    frame_ref[0, ys:ys + y_win, :].astype(
                        jnp.int16).astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
            for t in range(nct):
                cs = int(c_starts[t])
                ch_ref[buf, t * TILE:(t + 1) * TILE, :] = jnp.dot(
                    cblk_ref[t].astype(cdt),
                    frame_ref[0, cs:cs + c_win, :].astype(
                        jnp.int16).astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)

        @pl.when(s > 0)
        def _():
            buf = (s + 1) % 2
            for t in range(nwt):
                ws = int(wy_starts[t])
                acc = jnp.dot(yh_ref[buf, :DH, ws:ws + wy_winw],
                              wyb_ref[t].astype(cdt),
                              preferred_element_type=jnp.float32)
                yout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = \
                    jnp.clip(jnp.round(acc), 0.0, 255.0).astype(
                        jnp.int32).astype(jnp.uint8)
                cs = int(wc_starts[t])
                accc = jnp.dot(ch_ref[buf, :DC, cs:cs + wc_winw],
                               wcb_ref[t].astype(cdt),
                               preferred_element_type=jnp.float32)
                cout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = \
                    jnp.clip(jnp.round(accc), 0.0, 255.0).astype(
                        jnp.int32).astype(jnp.uint8)

    y_out, c_out = pl.pallas_call(
        kernel,
        grid=(Bn + 1,),
        in_specs=[
            pl.BlockSpec((1, rows, W),
                         lambda b: (jnp.minimum(b, Bn - 1), 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec((1, DH, dwp),
                         lambda b: (jnp.maximum(b - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DC, dwp),
                         lambda b: (jnp.maximum(b - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2, dh_pad, W), cdt),
                        pltpu.VMEM((2, dc_pad, W), cdt)],
        out_shape=[jax.ShapeDtypeStruct((Bn, DH, dwp), jnp.uint8),
                   jax.ShapeDtypeStruct((Bn, DC, dwp), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks), jnp.asarray(wc_blocks))
    return jnp.concatenate([y_out[:, :, :DW], c_out[:, :, :DW]], axis=1)


def main_skewed():
    import sys
    rng = np.random.default_rng(0)
    pad = required_pad_rows_resize(W, H, DW, DH)
    nv12 = np.zeros((B, H * 3 // 2 + pad, W), np.uint8)
    nv12[:, :H * 3 // 2] = rng.integers(0, 256, (B, H * 3 // 2, W),
                                        dtype=np.uint8)
    x = jnp.asarray(nv12)
    base = lambda a: pallas_nv12_resize(a, src_w=W, src_h=H, dst_w=DW,
                                        dst_h=DH)
    ref = np.asarray(jax.jit(base)(x[:4]))
    try:
        out = np.asarray(jax.jit(skewed)(x[:4]))
        d = np.abs(out.astype(int) - ref.astype(int)).max()
        ms, spread = _time_kernel(skewed, x)
        print(f"skewed: {ms*1000:.3f} ms/{B} = {ms/B*1e6:.1f} us/frame "
              f"spread={spread:.1%} maxdiff={d}", flush=True)
    except Exception as e:
        print(f"skewed: FAILED {type(e).__name__}: {str(e)[:400]}",
              flush=True)
    ms, spread = _time_kernel(base, x)
    print(f"prod  : {ms*1000:.3f} ms/{B} = {ms/B*1e6:.1f} us/frame "
          f"spread={spread:.1%}", flush=True)


@functools.partial(jax.jit, static_argnames=("nslabs", "h_align",
                                              "w_align"))
def slabs(nv12, *, nslabs=4, h_align=8, w_align=32):
    """Row-slab input split: the SAME input array passed nslabs times
    with block row-offsets, so Mosaic keeps nslabs concurrent input
    DMAs in flight per grid step instead of one serialized 12.4 MB
    transfer (single-stream large-block rate ~534 GB/s; 3.1 MB blocks
    measured ~930). H-pass windows that straddle a slab boundary take
    partial dots from both slabs (split-K f32 accumulation)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn = nv12.shape[0]
    cdt = jnp.bfloat16
    wy_rows = resize_weights(H, DH, "lanczos_aa")
    wc_rows = resize_weights(H // 2, DC, "lanczos_aa")
    y_starts, y_blocks, y_win, y_end = _banded_blocks_from_dense(
        wy_rows, TILE, h_align, H * 3 // 2)
    c_starts, c_blocks, c_win, c_end = _banded_blocks_from_dense(
        wc_rows, TILE, h_align, H * 3 // 2, row_offset=H)
    nyt, nct = y_blocks.shape[0], c_blocks.shape[0]

    rows_needed = max(H * 3 // 2, y_end, c_end)
    slab = ((rows_needed + nslabs - 1) // nslabs + 31) // 32 * 32
    rows = slab * nslabs
    if nv12.shape[1] < rows:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows - nv12.shape[1]), (0, 0)))
    else:
        nv12 = nv12[:, :rows]

    wy_cols = resize_weights(W, DW, "lanczos_aa")
    wc_cols = resize_weights(W // 2, DW // 2, "lanczos_aa")
    s_, b_, wy_winw, _ = _banded_blocks_from_dense(
        wy_cols, LANE_TILE, w_align, W, clamp_to_extent=True)
    wy_starts, wy_blocks = s_, np.transpose(b_, (0, 2, 1)).copy()
    nwt = wy_blocks.shape[0]
    wc_starts, wc_blocks, wc_winw = _interleave_w_blocks(
        wc_cols, W, DW, LANE_TILE, w_align)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    dc_pad = ((DC + TILE - 1) // TILE) * TILE
    dwp = nwt * LANE_TILE

    def _h_dots(slab_refs, blk_ref, starts, win, n_tiles, out, weights_np):
        """Per-tile dots with per-slab partials for straddlers."""
        for t in range(n_tiles):
            s0 = int(starts[t])
            pieces = []
            for si in range(nslabs):
                lo, hi = si * slab, (si + 1) * slab
                a, b2 = max(s0, lo), min(s0 + win, hi)
                if a >= b2:
                    continue
                wseg = blk_ref[t][:, a - s0:b2 - s0]
                seg = slab_refs[si][0, a - lo:b2 - lo, :]
                pieces.append(jnp.dot(
                    wseg.astype(cdt),
                    seg.astype(jnp.int16).astype(cdt),
                    preferred_element_type=jnp.float32))
            acc = pieces[0]
            for p in pieces[1:]:
                acc = acc + p
            out(t, acc.astype(cdt))

    def kernel(*refs):
        slab_refs = refs[:nslabs]
        (yblk_ref, cblk_ref, wyb_ref, wcb_ref, yout_ref, cout_ref,
         yh_ref, ch_ref) = refs[nslabs:]
        _h_dots(slab_refs, yblk_ref, y_starts, y_win, nyt,
                lambda t, v: yh_ref.__setitem__(
                    slice(t * TILE, (t + 1) * TILE), v), y_blocks)
        _h_dots(slab_refs, cblk_ref, c_starts, c_win, nct,
                lambda t, v: ch_ref.__setitem__(
                    slice(t * TILE, (t + 1) * TILE), v), c_blocks)
        for t in range(nwt):
            ws = int(wy_starts[t])
            acc = jnp.dot(yh_ref[:DH, ws:ws + wy_winw],
                          wyb_ref[t].astype(cdt),
                          preferred_element_type=jnp.float32)
            yout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.clip(
                jnp.round(acc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)
            cs = int(wc_starts[t])
            accc = jnp.dot(ch_ref[:DC, cs:cs + wc_winw],
                           wcb_ref[t].astype(cdt),
                           preferred_element_type=jnp.float32)
            cout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.clip(
                jnp.round(accc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    y_out, c_out = pl.pallas_call(
        kernel,
        grid=(Bn,),
        in_specs=[
            pl.BlockSpec((1, slab, W), lambda b, si=si: (b, si, 0),
                         memory_space=pltpu.VMEM)
            for si in range(nslabs)
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec((1, DH, dwp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DC, dwp), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((dh_pad, W), cdt),
                        pltpu.VMEM((dc_pad, W), cdt)],
        out_shape=[jax.ShapeDtypeStruct((Bn, DH, dwp), jnp.uint8),
                   jax.ShapeDtypeStruct((Bn, DC, dwp), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*([nv12] * nslabs), jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks), jnp.asarray(wc_blocks))
    return jnp.concatenate([y_out[:, :, :DW], c_out[:, :, :DW]], axis=1)


def _slab_rows(nslabs, h_align):
    """Rows the slab kernel wants, so the lab input is exactly sized
    (a pad/slice inside jit would add a 400 MB copy to the timing)."""
    wy_rows = resize_weights(H, DH, "lanczos_aa")
    wc_rows = resize_weights(H // 2, DC, "lanczos_aa")
    _, _, _, y_end = _banded_blocks_from_dense(
        wy_rows, TILE, h_align, H * 3 // 2)
    _, _, _, c_end = _banded_blocks_from_dense(
        wc_rows, TILE, h_align, H * 3 // 2, row_offset=H)
    rows_needed = max(H * 3 // 2, y_end, c_end)
    slab = ((rows_needed + nslabs - 1) // nslabs + 31) // 32 * 32
    return slab * nslabs


def main_slabs():
    import sys
    rng = np.random.default_rng(0)
    pad = max(required_pad_rows_resize(W, H, DW, DH), 128)
    nv12 = np.zeros((B, H * 3 // 2 + pad, W), np.uint8)
    nv12[:, :H * 3 // 2] = rng.integers(0, 256, (B, H * 3 // 2, W),
                                        dtype=np.uint8)
    x0 = jnp.asarray(nv12)
    ref = np.asarray(jax.jit(lambda a: pallas_nv12_resize(
        a, src_w=W, src_h=H, dst_w=DW, dst_h=DH))(x0[:2]))
    cases = [(4, 8, 32), (2, 8, 32), (6, 8, 32)]
    if sys.argv[2:]:
        cases = [tuple(int(v) for v in a.split(",")) for a in sys.argv[2:]]
    for ns, ha, wa in cases:
        rows = _slab_rows(ns, ha)
        xs = np.zeros((B, rows, W), np.uint8)
        xs[:, :H * 3 // 2] = nv12[:, :H * 3 // 2]
        x = jnp.asarray(xs)
        fn = lambda a, n=ns, h=ha, w=wa: slabs(a, nslabs=n, h_align=h,
                                               w_align=w)
        try:
            out = np.asarray(jax.jit(fn)(x[:2]))
            d = np.abs(out.astype(int) - ref.astype(int)).max()
            ms, spread = _time_kernel(fn, x)
            print(f"slabs n={ns} h={ha} w={wa}: {ms*1000:.3f} ms/{B} = "
                  f"{ms/B*1e6:.1f} us/frame spread={spread:.1%} "
                  f"maxdiff={d}", flush=True)
        except Exception as e:
            print(f"slabs n={ns} h={ha} w={wa}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


@functools.partial(jax.jit, static_argnames=("nw", "store"))
def striped(nv12, *, nw=3, store="dyn"):
    """W-stripe grid: (B, NW) with the input block a vertical stripe
    (rows, W/NW). The H-pass never mixes lanes, so stripes are
    independent (no overlap, no accumulation — bit-identical dots);
    the W-pass runs under pl.when on the last stripe. Moves the input
    DMA from one 12.6 MB whole-frame block (~540 GB/s) into the
    ~2-4 MB block regime (~930 GB/s).

    store: how the H-pass writes its stripe of the [dh_pad, W] scratch
      dyn    — dynamic lane offset s*SW (multiple_of-hinted)
      relay  — 3D scratch [NW, dh_pad, SW], relayout on last stripe
      unroll — pl.when(s == si) with static offsets per stripe
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Bn = nv12.shape[0]
    SW = W // nw
    assert W % nw == 0 and SW % 128 == 0
    cdt = jnp.bfloat16
    wy_rows = resize_weights(H, DH, "lanczos_aa")
    wc_rows = resize_weights(H // 2, DC, "lanczos_aa")
    y_starts, y_blocks, y_win, y_end = _banded_blocks_from_dense(
        wy_rows, TILE, ALIGN, H * 3 // 2)
    c_starts, c_blocks, c_win, c_end = _banded_blocks_from_dense(
        wc_rows, TILE, ALIGN, H * 3 // 2, row_offset=H)
    rows = nv12.shape[1]
    nyt, nct = y_blocks.shape[0], c_blocks.shape[0]

    wy_cols = resize_weights(W, DW, "lanczos_aa")
    wc_cols = resize_weights(W // 2, DW // 2, "lanczos_aa")
    s_, b_, wy_winw, _ = _banded_blocks_from_dense(
        wy_cols, LANE_TILE, LANE_ALIGN, W, clamp_to_extent=True)
    wy_starts, wy_blocks = s_, np.transpose(b_, (0, 2, 1)).copy()
    nwt = wy_blocks.shape[0]
    wc_starts, wc_blocks, wc_winw = _interleave_w_blocks(
        wc_cols, W, DW, LANE_TILE, LANE_ALIGN)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    dc_pad = ((DC + TILE - 1) // TILE) * TILE
    dwp = nwt * LANE_TILE

    def _h_pass(frame_ref, yblk_ref, cblk_ref, dst_y, dst_c):
        for t in range(nyt):
            ys = int(y_starts[t])
            dst_y(t, jnp.dot(
                yblk_ref[t].astype(cdt),
                frame_ref[0, ys:ys + y_win, :].astype(jnp.int16).astype(
                    cdt),
                preferred_element_type=jnp.float32).astype(cdt))
        for t in range(nct):
            cs = int(c_starts[t])
            dst_c(t, jnp.dot(
                cblk_ref[t].astype(cdt),
                frame_ref[0, cs:cs + c_win, :].astype(jnp.int16).astype(
                    cdt),
                preferred_element_type=jnp.float32).astype(cdt))

    def _w_pass(wyb_ref, wcb_ref, yh_ref, ch_ref, yout_ref, cout_ref):
        for t in range(nwt):
            ws = int(wy_starts[t])
            acc = jnp.dot(yh_ref[:DH, ws:ws + wy_winw],
                          wyb_ref[t].astype(cdt),
                          preferred_element_type=jnp.float32)
            yout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.clip(
                jnp.round(acc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)
            cs = int(wc_starts[t])
            accc = jnp.dot(ch_ref[:DC, cs:cs + wc_winw],
                           wcb_ref[t].astype(cdt),
                           preferred_element_type=jnp.float32)
            cout_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.clip(
                jnp.round(accc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    if store == "relay":
        def kernel(frame_ref, yblk_ref, cblk_ref, wyb_ref, wcb_ref,
                   yout_ref, cout_ref, ys_ref, cs_ref, yh_ref, ch_ref):
            s = pl.program_id(1)
            _h_pass(frame_ref, yblk_ref, cblk_ref,
                    lambda t, v: ys_ref.__setitem__(
                        (s, slice(t * TILE, (t + 1) * TILE)), v),
                    lambda t, v: cs_ref.__setitem__(
                        (s, slice(t * TILE, (t + 1) * TILE)), v))

            @pl.when(s == nw - 1)
            def _():
                for si in range(nw):
                    yh_ref[:, si * SW:(si + 1) * SW] = ys_ref[si]
                    ch_ref[:, si * SW:(si + 1) * SW] = cs_ref[si]
                _w_pass(wyb_ref, wcb_ref, yh_ref, ch_ref, yout_ref,
                        cout_ref)
        scratch = [pltpu.VMEM((nw, dh_pad, SW), cdt),
                   pltpu.VMEM((nw, dc_pad, SW), cdt),
                   pltpu.VMEM((dh_pad, W), cdt),
                   pltpu.VMEM((dc_pad, W), cdt)]
    else:
        def kernel(frame_ref, yblk_ref, cblk_ref, wyb_ref, wcb_ref,
                   yout_ref, cout_ref, yh_ref, ch_ref):
            s = pl.program_id(1)
            if store == "dyn":
                off = pl.multiple_of(s * SW, 128)
                _h_pass(frame_ref, yblk_ref, cblk_ref,
                        lambda t, v: yh_ref.__setitem__(
                            (slice(t * TILE, (t + 1) * TILE),
                             pl.ds(off, SW)), v),
                        lambda t, v: ch_ref.__setitem__(
                            (slice(t * TILE, (t + 1) * TILE),
                             pl.ds(off, SW)), v))
            else:  # unroll
                for si in range(nw):
                    @pl.when(s == si)
                    def _(si=si):
                        sl = slice(si * SW, (si + 1) * SW)
                        _h_pass(
                            frame_ref, yblk_ref, cblk_ref,
                            lambda t, v: yh_ref.__setitem__(
                                (slice(t * TILE, (t + 1) * TILE), sl), v),
                            lambda t, v: ch_ref.__setitem__(
                                (slice(t * TILE, (t + 1) * TILE), sl), v))

            @pl.when(s == nw - 1)
            def _():
                _w_pass(wyb_ref, wcb_ref, yh_ref, ch_ref, yout_ref,
                        cout_ref)
        scratch = [pltpu.VMEM((dh_pad, W), cdt),
                   pltpu.VMEM((dc_pad, W), cdt)]

    y_out, c_out = pl.pallas_call(
        kernel,
        grid=(Bn, nw),
        in_specs=[
            pl.BlockSpec((1, rows, SW), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=[
            pl.BlockSpec((1, DH, dwp), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DC, dwp), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=scratch,
        out_shape=[jax.ShapeDtypeStruct((Bn, DH, dwp), jnp.uint8),
                   jax.ShapeDtypeStruct((Bn, DC, dwp), jnp.uint8)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks), jnp.asarray(wc_blocks))
    return jnp.concatenate([y_out[:, :, :DW], c_out[:, :, :DW]], axis=1)


def main_striped():
    import sys
    rng = np.random.default_rng(0)
    pad = required_pad_rows_resize(W, H, DW, DH)
    nv12 = np.zeros((B, H * 3 // 2 + pad, W), np.uint8)
    nv12[:, :H * 3 // 2] = rng.integers(0, 256, (B, H * 3 // 2, W),
                                        dtype=np.uint8)
    x = jnp.asarray(nv12)
    ref = np.asarray(jax.jit(lambda a: pallas_nv12_resize(
        a, src_w=W, src_h=H, dst_w=DW, dst_h=DH))(x[:2]))
    cases = [(3, "dyn"), (5, "dyn"), (2, "dyn"), (6, "dyn")]
    if sys.argv[2:]:
        cases = [(int(a.split(",")[0]), a.split(",")[1])
                 for a in sys.argv[2:]]
    for nw, store in cases:
        fn = lambda a, n=nw, st=store: striped(a, nw=n, store=st)
        try:
            out = np.asarray(jax.jit(fn)(x[:2]))
            d = np.abs(out.astype(int) - ref.astype(int)).max()
            ms, spread = _time_kernel(fn, x)
            print(f"striped nw={nw} store={store}: {ms*1000:.3f} ms/{B} "
                  f"= {ms/B*1e6:.1f} us/frame spread={spread:.1%} "
                  f"maxdiff={d}", flush=True)
        except Exception as e:
            print(f"striped nw={nw} store={store}: FAILED "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)


def main_streamed():
    import sys
    rng = np.random.default_rng(0)
    pad = required_pad_rows_resize(W, H, DW, DH)
    nv12 = np.zeros((B, H * 3 // 2 + pad, W), np.uint8)
    nv12[:, :H * 3 // 2] = rng.integers(0, 256, (B, H * 3 // 2, W),
                                        dtype=np.uint8)
    x = jnp.asarray(nv12)
    ref = np.asarray(jax.jit(lambda a: pallas_nv12_resize(
        a, src_w=W, src_h=H, dst_w=DW, dst_h=DH))(x[:2]))
    for band in (256, 512):
        fn = lambda a, bd=band: streamed(a, band=bd)
        out = np.asarray(jax.jit(fn)(x[:2]))
        d = np.abs(out.astype(int) - ref.astype(int)).max()
        ms, spread = _time_kernel(fn, x)
        print(f"streamed band={band}: {ms*1000:.3f} ms/{B} = "
              f"{ms/B*1e6:.1f} us/frame spread={spread:.1%} maxdiff={d}",
              flush=True)


if __name__ == "__main__":
    import sys
    if sys.argv[1:2] == ["streamed"]:
        main_streamed()
    elif sys.argv[1:2] == ["striped"]:
        main_striped()
    elif sys.argv[1:2] == ["aligned"]:
        main_aligned()
    elif sys.argv[1:2] == ["slabs"]:
        main_slabs()
    elif sys.argv[1:2] == ["skewed"]:
        main_skewed()
    else:
        main()
