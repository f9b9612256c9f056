"""Lab: pallas_nv12_to_rgb structural variants (config-2 stage 1).

V0 production (group mode, per-tile casts, separate luma/chroma matmuls)
V1 pre-cast luma + chroma into bf16 scratches once; slice bf16 windows
V2 V1 + interleaved [luma|chroma] 256-lane group layout -> ONE K=256
   matmul per group against a single shared [256, 384] block
(V1/V2 both measured slower than V0 — the pre-cast scratch traffic and
the K=256 block's extra zeros cost more than the per-tile casts.)

Round-3 probe decomposition (64x1080p, after the time_fn slice-sum fix;
us/frame):
  inonly  (full input block, tiny output)          14.2
  outonly (8-row input, full 6.2 MB packed out)    20.0
  outband (same, 5x 1.24 MB out row-band blocks)   20.0  <- block size
                                                      doesn't matter
  dma     (full in + full out, no matmuls)         25.1
  production                                       30.0 -> 25.5 after
                                                      the pad fix
The probe numbers above were all measured THROUGH a hidden device-side
jnp.pad: the aligned-only clamp could not reach the last
extent%align rows (1620 % 8 = 4), so clamp-over-pad silently never
engaged at 1080p and every per-call 240 MB pad copy stayed (the
"1.92 pre / 1.94 post within spread" reading was pad-vs-pad). After
letting the FINAL clamped window start unaligned at extent-win
(bit-identical, maxdiff=0 padded-vs-unpadded on all three kernel
families), production measures 1.25 ms/batch and the two-stage total
dropped 2.44 -> 1.75 ms/batch = 36.7k fps (config 2 target 25k: MET
with 47% headroom; stage split now ~1.25 convert + ~0.49 resize).

Post-fix probe decomposition (production no longer pads; the probe
kernels still build unclamped blocks, so dma/noquant still carry it):
  inonly   0.95 ms/batch (14.9 us/frame)
  outonly  1.30 (20.3)   <- full 6.2 MB/frame packed store, 8-row input
  production 1.29 (20.1) == outonly: the kernel sits AT its
    output-store floor (~305 GB/s store rate for this pattern; outband
    row-band stores measured flat earlier, so block size is not the
    lever). Further gains need a faster packed u8 store or less output
    — i.e. the fused kernel, which is the headline path anyway."""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp

from bench_kernel_variants import time_fn
from vali_tpu.core.details import ColorspaceConversionContext
from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
from vali_tpu.ops import colors, csc
from vali_tpu.ops.pallas_fused import (TILE, ALIGN,
                                       _banded_blocks_from_dense,
                                       pallas_nv12_to_rgb)

B, H, W = 64, 1080, 1920
SPACE, CRANGE = ColorSpace.BT_709, ColorRange.MPEG
rng = np.random.default_rng(0)
NV12 = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W), dtype=np.uint8))


def _repl_blocks():
    R = np.zeros((H, H // 2), dtype=np.float32)
    R[np.arange(H), np.arange(H) // 2] = 1.0
    return _banded_blocks_from_dense(R, TILE, ALIGN, H * 3 // 2,
                                     row_offset=H)


def _group_mats(P=128):
    m, y_off = colors.yuv2rgb_matrix(SPACE, CRANGE)
    m = m.astype(np.float32)
    p = np.arange(P)
    Ag = np.zeros((P, 3 * P), dtype=np.float32)
    Bg = np.zeros((P, 3 * P), dtype=np.float32)
    for c in range(3):
        Ag[p, 3 * p + c] = m[c, 0]
        Bg[2 * (p // 2), 3 * p + c] = m[c, 1]
        Bg[2 * (p // 2) + 1, 3 * p + c] = m[c, 2]
    off = np.zeros((1, 3 * W), dtype=np.float32)
    for c in range(3):
        off[0, c::3][:W] = -(m[c, 0] * y_off + (m[c, 1] + m[c, 2]) * 128.0)
    return Ag, Bg, off


@functools.partial(jax.jit, static_argnames=("variant",))
def variant_kernel(nv12, variant="V1"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = nv12.shape[0]
    cdt = jnp.bfloat16
    P = 128
    ng = W // P
    OW = 3 * W
    Ag, Bg, off = _group_mats(P)
    r_starts, r_blocks, r_win, r_end = _repl_blocks()
    n_rt = r_blocks.shape[0]
    if nv12.shape[1] < r_end:
        nv12 = jnp.pad(nv12, ((0, 0), (0, r_end - nv12.shape[1]), (0, 0)))
    rows = nv12.shape[1]
    h_pad = n_rt * TILE
    AB = np.concatenate([Ag, Bg], axis=0)  # [2P, 3P] for V2

    def kern_v1(f_ref, rblk_ref, a_ref, bref, off_ref, out_ref,
                cf_ref, yb_ref):
        yb_ref[:, :] = f_ref[0, :H, :].astype(jnp.int16).astype(cdt)
        for t in range(n_rt):
            rs = int(r_starts[t])
            win = f_ref[0, rs:rs + r_win, :].astype(jnp.int16).astype(cdt)
            cf_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                rblk_ref[t].astype(cdt), win,
                preferred_element_type=jnp.float32).astype(cdt)
        for t in range(ng):
            s = t * P
            acc = jnp.dot(yb_ref[:, s:s + P], a_ref[...],
                          preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(cf_ref[:H, s:s + P], bref[...],
                                preferred_element_type=jnp.float32)
            acc = acc + off_ref[0, t * 3 * P:(t + 1) * 3 * P]
            out_ref[0, :, t * 3 * P:(t + 1) * 3 * P] = jnp.clip(
                jnp.round(acc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    def kern_v2(f_ref, rblk_ref, ab_ref, off_ref, out_ref, cf_ref,
                yc_ref):
        # interleaved [luma128 | chroma128] per group in one scratch
        for t in range(ng):
            s = t * P
            yc_ref[:H, 2 * s:2 * s + P] = f_ref[0, :H, s:s + P].astype(
                jnp.int16).astype(cdt)
        for t in range(n_rt):
            rs = int(r_starts[t])
            win = f_ref[0, rs:rs + r_win, :].astype(jnp.int16).astype(cdt)
            cf_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                rblk_ref[t].astype(cdt), win,
                preferred_element_type=jnp.float32).astype(cdt)
        for t in range(ng):
            s = t * P
            yc_ref[:H, 2 * s + P:2 * s + 2 * P] = cf_ref[:H, s:s + P]
        for t in range(ng):
            s = 2 * t * P
            acc = jnp.dot(yc_ref[:H, s:s + 2 * P], ab_ref[...],
                          preferred_element_type=jnp.float32)
            acc = acc + off_ref[0, t * 3 * P:(t + 1) * 3 * P]
            out_ref[0, :, t * 3 * P:(t + 1) * 3 * P] = jnp.clip(
                jnp.round(acc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    common = dict(
        grid=(b,),
        out_specs=pl.BlockSpec((1, H, OW), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, H, OW), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )
    if variant == "V1":
        return pl.pallas_call(
            kern_v1,
            in_specs=[pl.BlockSpec((1, rows, W), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            scratch_shapes=[pltpu.VMEM((h_pad, W), cdt),
                            pltpu.VMEM((H, W), cdt)],
            **common,
        )(nv12, jnp.asarray(r_blocks), jnp.asarray(Ag).astype(cdt),
          jnp.asarray(Bg).astype(cdt), jnp.asarray(off))
    return pl.pallas_call(
        kern_v2,
        in_specs=[pl.BlockSpec((1, rows, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        scratch_shapes=[pltpu.VMEM((h_pad, W), cdt),
                        pltpu.VMEM((H, 2 * W), cdt)],
        **common,
    )(nv12, jnp.asarray(r_blocks), jnp.asarray(AB).astype(cdt),
      jnp.asarray(off))


@functools.partial(jax.jit, static_argnames=("mode",))
def probe_kernel(nv12, mode="dma"):
    """Decompose the packed-convert time: dma = touch input, write
    output from a cheap broadcast (pure DMA in+out); noquant = full
    matmuls but store via plain astype (no round/clip/int32 hop);
    noh = full W matmuls + quant but chroma H-pass replaced by a copy
    of the half-res rows (measures the V-replication matmul)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = nv12.shape[0]
    cdt = jnp.bfloat16
    P = 128
    ng = W // P
    OW = 3 * W
    Ag, Bg, off = _group_mats(P)
    r_starts, r_blocks, r_win, r_end = _repl_blocks()
    n_rt = r_blocks.shape[0]
    if nv12.shape[1] < r_end:
        nv12 = jnp.pad(nv12, ((0, 0), (0, r_end - nv12.shape[1]), (0, 0)))
    rows = nv12.shape[1]
    h_pad = n_rt * TILE

    def kern_dma(f_ref, rblk_ref, a_ref, bref, off_ref, out_ref, cf_ref):
        v = f_ref[0, :1, :].astype(jnp.int16)
        for t in range(3):
            out_ref[0, :, t * W:(t + 1) * W] = jnp.broadcast_to(
                v, (H, W)).astype(jnp.uint8)

    def kern_inonly(f_ref, rblk_ref, a_ref, bref, off_ref, out_ref,
                    cf_ref):
        # touch the whole input, write a tiny output block
        acc = jnp.zeros((8, 128), jnp.float32)
        for t in range(0, rows, 512):
            acc = acc + f_ref[0, t:t + 8, :128].astype(jnp.int32).astype(
                jnp.float32)
        out_ref[0] = acc.astype(jnp.int32).astype(jnp.uint8)

    def kern_outonly(f_ref, rblk_ref, a_ref, bref, off_ref, out_ref,
                     cf_ref):
        # input block is 8 rows; fill the full packed output
        v = f_ref[0, :1, :].astype(jnp.int16)
        for t in range(3):
            out_ref[0, :, t * W:(t + 1) * W] = jnp.broadcast_to(
                v, (H, W)).astype(jnp.uint8)

    def kern_noquant(f_ref, rblk_ref, a_ref, bref, off_ref, out_ref,
                     cf_ref):
        for t in range(n_rt):
            rs = int(r_starts[t])
            win = f_ref[0, rs:rs + r_win, :].astype(jnp.int16).astype(cdt)
            cf_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                rblk_ref[t].astype(cdt), win,
                preferred_element_type=jnp.float32).astype(cdt)
        for t in range(ng):
            s = t * P
            yv = f_ref[0, :H, s:s + P].astype(jnp.int16).astype(cdt)
            acc = jnp.dot(yv, a_ref[...],
                          preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(cf_ref[:H, s:s + P], bref[...],
                                preferred_element_type=jnp.float32)
            acc = acc + off_ref[0, t * 3 * P:(t + 1) * 3 * P]
            out_ref[0, :, t * 3 * P:(t + 1) * 3 * P] = acc.astype(
                jnp.int32).astype(jnp.uint8)

    def kern_noh(f_ref, rblk_ref, a_ref, bref, off_ref, out_ref, cf_ref):
        for t in range(n_rt):
            cf_ref[t * TILE:(t + 1) * TILE, :] = f_ref[
                0, H + (t * TILE) // 2:H + (t * TILE) // 2 + TILE,
                :].astype(jnp.int16).astype(cdt)
        for t in range(ng):
            s = t * P
            yv = f_ref[0, :H, s:s + P].astype(jnp.int16).astype(cdt)
            acc = jnp.dot(yv, a_ref[...],
                          preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(cf_ref[:H, s:s + P], bref[...],
                                preferred_element_type=jnp.float32)
            acc = acc + off_ref[0, t * 3 * P:(t + 1) * 3 * P]
            out_ref[0, :, t * 3 * P:(t + 1) * 3 * P] = jnp.clip(
                jnp.round(acc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    if mode == "outband":
        # does banding the OUTPUT into 5 contiguous 1.24 MB blocks fix
        # the packed-store rate? (row-band grid, same total bytes)
        RB = 216

        def kern_outband(f_ref, rblk_ref, a_ref, bref, off_ref, out_ref):
            v = f_ref[0, :1, :].astype(jnp.int16)
            for t in range(3):
                out_ref[0, :, t * W:(t + 1) * W] = jnp.broadcast_to(
                    v, (RB, W)).astype(jnp.uint8)

        return pl.pallas_call(
            kern_outband,
            grid=(b, H // RB),
            in_specs=[pl.BlockSpec((1, 8, W), lambda i, t: (i, 0, 0),
                                   memory_space=pltpu.VMEM)]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec((1, RB, OW), lambda i, t: (i, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, H, OW), jnp.uint8),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024),
        )(nv12, jnp.asarray(r_blocks), jnp.asarray(Ag).astype(cdt),
          jnp.asarray(Bg).astype(cdt), jnp.asarray(off))

    kern = {"dma": kern_dma, "noquant": kern_noquant, "noh": kern_noh,
            "inonly": kern_inonly, "outonly": kern_outonly}[mode]
    in_rows = 8 if mode == "outonly" else rows
    out_shape = ((b, 8, 128) if mode == "inonly" else (b, H, OW))
    out_block = (1,) + out_shape[1:]
    return pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[pl.BlockSpec((1, in_rows, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(out_block, lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint8),
        scratch_shapes=[pltpu.VMEM((h_pad, W), cdt)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(nv12, jnp.asarray(r_blocks), jnp.asarray(Ag).astype(cdt),
      jnp.asarray(Bg).astype(cdt), jnp.asarray(off))


def main_probe():
    modes = sys.argv[2:] or ("inonly", "outonly", "noquant")
    for mode in modes:
        fn = functools.partial(probe_kernel, mode=mode)
        try:
            np.asarray(fn(NV12[:2]))
            ms, spread = time_fn(fn, NV12)
            print(f"probe {mode}: {ms*1000:.3f} ms/batch "
                  f"spread={spread:.1%} ({ms/B*1e6:.1f} us/frame)",
                  flush=True)
        except Exception as e:
            print(f"probe {mode}: FAILED {type(e).__name__}: "
                  f"{str(e)[:250]}", flush=True)
    fn = lambda x: pallas_nv12_to_rgb(
        x, src_w=W, src_h=H, space=SPACE, crange=CRANGE)
    ms, spread = time_fn(fn, NV12)
    print(f"production: {ms*1000:.3f} ms/batch spread={spread:.1%} "
          f"({ms/B*1e6:.1f} us/frame)", flush=True)


def main():
    cc = ColorspaceConversionContext(SPACE, CRANGE)
    ref = np.asarray(csc.convert_batch(
        (NV12[:2],), PixelFormat.NV12, PixelFormat.RGB, W, H, cc)[0])
    variants = sys.argv[1:] or ["V0", "V1", "V2"]
    for v in variants:
        if v == "V0":
            fn = lambda x: pallas_nv12_to_rgb(
                x, src_w=W, src_h=H, space=SPACE, crange=CRANGE)
        else:
            fn = functools.partial(variant_kernel, variant=v)
        try:
            out = np.asarray(fn(NV12[:2]))
            md = np.abs(out.astype(int) - ref.astype(int)).max()
            ms, spread = time_fn(fn, NV12)
            print(f"{v}: {ms*1000:.3f} ms/batch spread={spread:.1%} "
                  f"maxdiff={md} fps={B/ms:,.0f}", flush=True)
        except Exception as e:
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:250]}",
                  flush=True)


if __name__ == "__main__":
    if sys.argv[1:2] == ["probe"]:
        main_probe()
    else:
        main()
