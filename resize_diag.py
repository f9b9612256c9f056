"""Lab notebook: where do the 4K resize kernel's ~33 us/frame go?

Measured (v5e, 16x4K->1080p, bench.py's min-slope estimator):

  dma_only  (whole-frame VMEM block, no compute)   23.3 us/frame
  h_only    (+ banded H dots)                      23.6
  w_only    (+ banded W dots, no H)                24.1
  both (luma only)                                 26.0
  full production (incl. chroma W + 2 outputs)     32.7
  streamed band=256 (manual async band copies,     43.2  <- dead end
    frame in HBM, double-buffered DMA ring)
  streamed band=512                                42.6

Conclusions: the kernel is INPUT-DMA-bound — the 12.6 MB whole-frame
block moves at ~540 GB/s (vs 932 GB/s for the preprocess kernel's
3.2 MB blocks), and compute overlaps almost entirely behind it. Manual
band-streamed DMA (make_async_copy ring over an ANY-space input) is
bit-exact but ~30% SLOWER than Mosaic's automatic block pipelining, so
production keeps the simple whole-frame block. ~29-30k fps/chip stands,
9-10x the dense XLA path."""
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
    else:
        main()
