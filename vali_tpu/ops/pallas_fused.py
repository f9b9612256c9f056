"""Pallas TPU kernel: banded fused NV12 -> RGB -> resize preprocess.

The XLA version (ops/fused.py) expresses resampling as DENSE weight
matmuls: for 1080p -> 224 the H-pass burns 224x1080x1920 MACs even though
a Lanczos-3 row only touches ~50 input rows. This kernel exploits the
bandedness — the structural optimization XLA cannot see:

  - H-pass: per TILE-output-row tile, a [TILE, WIN] x [WIN, W] matmul
    over just a WIN-row window of the VMEM-resident frame. Window starts
    are host constants baked in as STATIC slices (an unrolled tile loop —
    measured ~15% faster than scalar-prefetch dynamic slices), with zero
    weights on out-of-plane taps; FLOPs drop ~10-17x vs dense.
  - W-pass: banded too — per 128-lane output tile, [DH, WIN] x
    [WIN, 128] over an aligned lane window of the H-pass scratch,
    bfloat16 in / f32 accumulate for uint8 input (the Lanczos band
    covers ~60% of the dense [W, DW] matrix at 1080p->224; see
    _resolve_compute_dtype for why f32 compute is a knob, not the
    default).
  - Chroma deinterleaving is folded into the W-pass weight matrix: the
    interleaved UV rows stay packed and parity-masked taps emit U and V
    side by side — no strided loads. The U and V output halves are
    padded to lane-tile multiples so no output tile straddles the U|V
    seam (a straddling tile's band spans the whole input and would
    silently force that pass dense).
  - CSC and quantization fuse at the tail; output is planar [3, DH, DW].

The input frame may need a few extra rows below the chroma plane
(32-aligned windows can overrun the plane tail with zero weights); the
wrapper pads automatically and the pipeline pre-pads staging buffers.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace
from . import colors
from .resize import LANCZOS_AA

TILE = 32    # output rows per banded H-pass step
# (TILE sweep on v5e: 8 -> 1.05ms, 32 -> 0.41ms, 64 -> 0.46ms, 128 -> 0.86ms
#  per 64x1080p batch; 32 balances MXU occupancy vs window overlap+VMEM.
#  Non-power-of-2 tiles (24, 48) compile to >1.1ms — avoid.)
ALIGN = 8    # window starts are STATIC slices (host constants baked into
# the unrolled tile loop), so no Mosaic dynamic-offset alignment applies;
# 8 keeps rows on sublane boundaries. Static windows measured 0.444 ms vs
# 0.516 ms for the scalar-prefetch dynamic-slice version (64x1080p->224).


def _resolve_compute_dtype(compute_dtype, hbd: bool = False):
    """Family-wide compute-dtype policy: uint8 input defaults to
    bfloat16 compute, uint16/float32 ("hbd") always computes in f32.

    ``compute_dtype=jnp.float32`` is the per-call exactness knob for
    uint8 input — precision=HIGHEST f32 dots match the dense XLA paths
    to <=1-LSB accumulation ties — but it is NOT free: on the v5e MXU
    an f32 HIGHEST matmul decomposes into multiple bf16 passes, and
    paired bench-harness measures put the f32 1080p->224 preprocess at
    1.56 ms/batch vs 0.314 for bf16 (~5x; 2026-08-19, spread 0.011 /
    0.028), with f32 Mosaic compiles also much slower (163 to >580 s
    observed vs 15-221 s for bf16 at this shape). An earlier same-day
    A/B that read "f32 at-or-faster than bf16" was mislabeled — its
    bf16 rows resolved to f32 through a mid-edit default — and briefly
    flipped these defaults; docs/PERFORMANCE.md lesson 10 has the
    post-mortem. When A/B-ing compute dtypes, pass BOTH explicitly.
    """
    if compute_dtype is None:
        return jnp.float32 if hbd else jnp.bfloat16
    req = np.dtype(compute_dtype)
    if req not in (np.dtype(np.float32), np.dtype(jnp.bfloat16)):
        raise ValueError(
            f"compute_dtype must be float32 or bfloat16, got {req}")
    if hbd and req != np.dtype(np.float32):
        raise ValueError(
            "high-bit-depth input (uint16 / float32) requires float32 "
            "compute — bfloat16 cannot hold its significant bits")
    return jnp.float32 if req == np.dtype(np.float32) else jnp.bfloat16


def _banded_h_weights(n_in: int, n_out: int, method: str,
                      row_offset: int = 0,
                      chroma_of: Optional[int] = None,
                      rows_have: Optional[int] = None):
    """Blocked banded H-pass weights with aligned absolute starts.

    Returns (starts [n_tiles] int32 — absolute frame rows,
             blocks [n_tiles, TILE, WIN] f32, win, max_end).

    Blocks are sliced out of the SAME dense matrices the XLA paths use
    (resize_weights for luma, fused._chroma_weights for 4:2:0-sited
    chroma), so kernel/phase/antialias conventions can never drift
    between the banded and dense implementations. Every tile's window
    covers its rows' full bands, so slicing is exact (no tap clipping).

    With ``rows_have`` (the rows the caller actually holds), windows
    that would overrun are pulled back into the array instead (zero
    weights cover the shift — bit-identical), so unpadded callers skip
    the device-side jnp.pad copy; max_end then never exceeds rows_have
    unless the input is smaller than one window.
    """
    from .resize import resize_weights

    if chroma_of is not None:
        from .fused import _chroma_weights

        dense = _chroma_weights(n_in, n_out, chroma_of, method)
    else:
        dense = resize_weights(n_in, n_out, method)
    if rows_have is not None:
        s, b, w, e = _row_blocks_fit(dense, TILE, ALIGN, rows_have,
                                     row_offset=row_offset)
        return s, b, w, e
    return _banded_blocks_from_dense(dense, TILE, ALIGN,
                                     n_in + row_offset,
                                     row_offset=row_offset)


def _w_weights(n_in: int, n_out: int, method: str) -> np.ndarray:
    from .resize import resize_weights

    return resize_weights(n_in, n_out, method).T.copy()  # [n_in, n_out]


def _chroma_w_weights_interleaved(full_w: int, n_out: int,
                                  method: str) -> np.ndarray:
    """[W, 2*DW] weights consuming an interleaved UV row directly:
    columns [:DW] produce U (even source lanes), [DW:] produce V (odd)."""
    from .fused import _chroma_weights

    n_in = full_w // 2
    w = _chroma_weights(n_in, n_out, full_w, method).T  # [n_in, n_out]
    out = np.zeros((full_w, 2 * n_out), dtype=np.float32)
    out[0::2, :n_out] = w  # U taps on even lanes
    out[1::2, n_out:] = w  # V taps on odd lanes
    return out


def required_pad_rows(src_w: int, src_h: int, dst_h: int,
                      method: str = LANCZOS_AA) -> int:
    """Extra rows (beyond H*3/2) the kernel input must carry."""
    _, _, _, y_end = _banded_h_weights(src_h, dst_h, method)
    _, _, _, c_end = _banded_h_weights(src_h // 2, dst_h, method,
                                       row_offset=src_h, chroma_of=src_h)
    return max(0, max(y_end, c_end) - src_h * 3 // 2)


@functools.partial(
    jax.jit,
    static_argnames=("src_w", "src_h", "dst_w", "dst_h", "space", "crange",
                     "out_dtype", "method", "normalize", "interpret",
                     "compute_dtype"))
def pallas_nv12_preprocess(
    nv12: jax.Array,  # [B, >= H*3/2 (+pad), W] uint8 (NV12) / uint16 (P10,
                      # P12: MSB-aligned 16-bit, like NVDEC P010/P012)
    *,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    space: ColorSpace = ColorSpace.BT_709,
    crange: ColorRange = ColorRange.MPEG,
    out_dtype=jnp.uint8,
    method: str = LANCZOS_AA,
    normalize=None,
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Fused NV12/P10/P12 batch -> planar RGB [B, 3, dst_h, dst_w].

    uint8 inputs compute in bfloat16 multiplies with an f32 H-pass
    accumulator rounded back to bf16 between the passes — measured
    envelope vs the true-f32 XLA fused path on random NV12: |d| <= 3
    with ~6% of pixels beyond 1 LSB, PSNR ~49 dB. uint16 inputs
    compute in float32 to preserve the 10/12 significant bits.

    ``compute_dtype=jnp.float32`` (uint8 input) is the exactness knob:
    precision=HIGHEST f32 dots collapse the envelope to |d|<=2 with
    0.03% beyond 1 LSB (bit-identical in interpret mode) — at ~5x the
    runtime (1.56 vs 0.314 ms per 64x1080p->224 batch, paired
    bench-harness measures 2026-08-19) and much slower Mosaic
    compiles. A same-day A/B claiming f32 was faster was mislabeled
    (docs/PERFORMANCE.md lesson 10 post-mortem).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = nv12.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    if nv12.shape[1] < H * 3 // 2 or nv12.shape[2] != W:
        raise ValueError(
            f"NV12 plane shape {nv12.shape} does not match {W}x{H}")
    hbd = np.dtype(nv12.dtype) == np.uint16  # MSB-aligned high bit depth
    cdt = _resolve_compute_dtype(compute_dtype, hbd)
    f32_compute = cdt == jnp.float32
    scale = 256.0 if hbd else 1.0

    y_starts, y_blocks, y_win, y_end = _banded_h_weights(
        H, DH, method, rows_have=nv12.shape[1])
    c_starts, c_blocks, c_win, c_end = _banded_h_weights(
        H // 2, DH, method, row_offset=H, chroma_of=H,
        rows_have=nv12.shape[1])
    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]

    # W pass is banded over output lane tiles too (Lanczos bands cover
    # only ~60% of the dense [W, DW] matrices at 1080p->224; measured
    # 0.428 -> 0.399 ms per 64-frame batch, bit-identical output)
    wys, wyb, wy_winw, _ = _banded_blocks_from_dense(
        _w_weights(W, DW, method).T, LANE_TILE, LANE_ALIGN, W,
        clamp_to_extent=True)
    wy_blocks = np.transpose(wyb, (0, 2, 1)).copy()
    # chroma W matrix: pad the U and V output halves independently to
    # LANE_TILE multiples so no output tile straddles the U|V boundary —
    # a straddling tile's band spans the whole input and would force the
    # banding to degenerate to dense (win == W).
    DWp = ((DW + LANE_TILE - 1) // LANE_TILE) * LANE_TILE
    _wc = _chroma_w_weights_interleaved(W, DW, method)      # [W, 2*DW]
    wc_dense = np.zeros((W, 2 * DWp), dtype=np.float32)
    wc_dense[:, :DW] = _wc[:, :DW]
    wc_dense[:, DWp:DWp + DW] = _wc[:, DW:]
    wcs, wcb, wc_winw, _ = _banded_blocks_from_dense(
        wc_dense.T, LANE_TILE, LANE_ALIGN, W, clamp_to_extent=True)
    wc_blocks = np.transpose(wcb, (0, 2, 1)).copy()
    nwt, nct_w = wy_blocks.shape[0], wc_blocks.shape[0]
    n_tiles = y_blocks.shape[0]

    mo = colors.yuv2rgb_matrix(space, crange)
    if mo is None:
        raise ValueError(f"Unsupported cc combo {space}/{crange}")
    m, y_off = mo
    m = m.astype(np.float32)

    is_u8 = np.dtype(out_dtype) == np.uint8
    if normalize is not None and is_u8:
        raise ValueError("normalize requires a float out_dtype")
    norm_mean = tuple(float(v) for v in normalize[0]) if normalize else None
    norm_std = tuple(float(v) for v in normalize[1]) if normalize else None

    def _to_compute(x):
        if hbd or f32_compute:  # the wide chain: u8/u16 -> i32 -> f32
            return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)
        # u8: Mosaic can't cast u8->bf16 directly, but u8->i16->bf16 works
        # and i16 halves the vreg traffic of the i32 route (measured: the
        # cast chain is the kernel's VPU co-bottleneck with the MXU).
        return x.astype(jnp.int16).astype(cdt)

    # f32 compute pins the MXU to true-f32 multiplies: without the pin
    # both Mosaic and on-TPU jnp run f32 dots as bf16 multiplies with
    # f32 accumulate (diagnosed 2026-08-19: the bf16-rounded WEIGHTS,
    # not the exact u8 samples, were the 3-LSB error source).
    prec = jax.lax.Precision.HIGHEST if f32_compute else None

    def kernel(frame_ref, yblk_ref, cblk_ref, wyb_ref, wcb_ref, out_ref,
               yh_ref, ch_ref, yw_ref, cw_ref):
        # --- banded H pass: luma + interleaved chroma ------------------
        # window starts are host constants -> unrolled loop with STATIC
        # slices (no scalar prefetch / dynamic-shift machinery)
        for t in range(n_tiles):
            ys, cs = int(y_starts[t]), int(c_starts[t])
            ywin = _to_compute(frame_ref[0, ys:ys + y_win, :])
            yh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                yblk_ref[t].astype(cdt), ywin, precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)
            cwin = _to_compute(frame_ref[0, cs:cs + c_win, :])
            ch_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                cblk_ref[t].astype(cdt), cwin, precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)

        # --- banded W pass over output lane tiles ----------------------
        for t in range(nwt):
            ws = int(wys[t])
            yw_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                yh_ref[:DH, ws:ws + wy_winw], wyb_ref[t].astype(cdt),
                precision=prec,
                preferred_element_type=jnp.float32)
        for t in range(nct_w):
            ws = int(wcs[t])
            cw_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                ch_ref[:DH, ws:ws + wc_winw], wcb_ref[t].astype(cdt),
                precision=prec,
                preferred_element_type=jnp.float32)
        u = cw_ref[:, :DW] - 128.0 * scale
        v = cw_ref[:, DWp:DWp + DW] - 128.0 * scale
        yv = yw_ref[:, :DW] - y_off * scale

        r = m[0, 0] * yv + m[0, 1] * u + m[0, 2] * v
        g = m[1, 0] * yv + m[1, 1] * u + m[1, 2] * v
        b = m[2, 0] * yv + m[2, 1] * u + m[2, 2] * v

        if is_u8:
            for idx, ch in ((0, r), (1, g), (2, b)):
                out_ref[0, idx] = jnp.clip(jnp.round(ch / scale), 0.0,
                                           255.0).astype(
                    jnp.int32).astype(jnp.uint8)
        else:
            for idx, ch in ((0, r), (1, g), (2, b)):
                val = ch / (255.0 * scale)
                if norm_mean is not None:
                    val = (val - norm_mean[idx]) / norm_std[idx]
                out_ref[0, idx] = val.astype(out_ref.dtype)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE

    flops = B * (n_tiles * TILE * (y_win + c_win) * W * 2
                 + DH * (nwt * wy_winw + nct_w * wc_winw) * LANE_TILE * 2)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # y_blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # c_blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wy_blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wc_blocks
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dh_pad, W), cdt),  # yh
            pltpu.VMEM((dh_pad, W), cdt),  # ch
            pltpu.VMEM((DH, nwt * LANE_TILE), jnp.float32),    # yw
            pltpu.VMEM((DH, nct_w * LANE_TILE), jnp.float32),  # cw
        ],
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(nv12.size) + B * 3 * DH * DW,
            transcendentals=0),
        interpret=interpret,
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks).astype(cdt), jnp.asarray(wc_blocks).astype(cdt))
    return out


def required_pad_rows_yuv444(src_w: int, src_h: int, dst_h: int,
                             method: str = LANCZOS_AA) -> int:
    """Extra rows (beyond H) each YUV444 plane must carry."""
    _, _, _, y_end = _banded_h_weights(src_h, dst_h, method)
    return max(0, y_end - src_h)


@functools.partial(
    jax.jit,
    static_argnames=("src_w", "src_h", "dst_w", "dst_h", "space", "crange",
                     "out_dtype", "method", "normalize", "interpret",
                     "compute_dtype"))
def pallas_yuv444_preprocess(
    y: jax.Array,  # [B, >= H (+pad), W] uint8 each
    u: jax.Array,
    v: jax.Array,
    *,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    space: ColorSpace = ColorSpace.BT_709,
    crange: ColorRange = ColorRange.MPEG,
    out_dtype=jnp.uint8,
    method: str = LANCZOS_AA,
    normalize=None,
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Planar YUV444 batch -> planar RGB [B, 3, dst_h, dst_w].

    All three planes are full resolution, so one banded weight set
    serves every plane — the simplest member of the kernel family
    (parity ancestor: the 4:4:4 paths of TaskConvertSurface.cpp +
    TaskResizeSurface.cpp, fused like ResizeUtils.cu does for NV12).

    ``compute_dtype``: bfloat16 (uint8 default) or float32 (the
    exactness knob) — see the NV12 kernel's docstring for the
    measured speed/quality trade.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = y.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    if y.shape[1] < H or y.shape[2] != W or u.shape != y.shape \
            or v.shape != y.shape:
        raise ValueError(
            f"Plane shapes {y.shape}/{u.shape}/{v.shape} do not match "
            f"YUV444 {W}x{H}")

    y_starts, y_blocks, y_win, y_end = _banded_h_weights(
        H, DH, method, rows_have=y.shape[1])
    if y.shape[1] < y_end:
        padn = y_end - y.shape[1]
        y = jnp.pad(y, ((0, 0), (0, padn), (0, 0)))
        u = jnp.pad(u, ((0, 0), (0, padn), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, padn), (0, 0)))
    rows = y.shape[1]

    cdt = _resolve_compute_dtype(compute_dtype)
    f32_compute = cdt == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_compute else None

    wys, wyb, wy_winw, _ = _banded_blocks_from_dense(
        _w_weights(W, DW, method).T, LANE_TILE, LANE_ALIGN, W,
        clamp_to_extent=True)
    wy_blocks = jnp.asarray(np.transpose(wyb, (0, 2, 1)).copy()).astype(cdt)
    nwt = wyb.shape[0]
    n_tiles = y_blocks.shape[0]

    mo = colors.yuv2rgb_matrix(space, crange)
    if mo is None:
        raise ValueError(f"Unsupported cc combo {space}/{crange}")
    m, y_off = mo
    m = m.astype(np.float32)
    is_u8 = np.dtype(out_dtype) == np.uint8
    if normalize is not None and is_u8:
        raise ValueError("normalize requires a float out_dtype")
    norm_mean = tuple(float(x) for x in normalize[0]) if normalize else None
    norm_std = tuple(float(x) for x in normalize[1]) if normalize else None

    def _to_compute(x):
        if f32_compute:  # the exact wide chain: u8 -> i32 -> f32
            return x.astype(jnp.int32).astype(jnp.float32)
        # u8 -> i16 -> bf16: shortest Mosaic-supported exact chain
        return x.astype(jnp.int16).astype(cdt)

    def kernel(y_ref, u_ref, v_ref, yblk_ref, wyb_ref, out_ref,
               yh_ref, uh_ref, vh_ref, w0_ref, w1_ref, w2_ref):
        for t in range(n_tiles):
            ys = int(y_starts[t])
            blk = yblk_ref[t].astype(cdt)
            for src_ref, dst_ref in ((y_ref, yh_ref), (u_ref, uh_ref),
                                     (v_ref, vh_ref)):
                dst_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                    blk, _to_compute(src_ref[0, ys:ys + y_win, :]),
                    precision=prec,
                    preferred_element_type=jnp.float32).astype(cdt)

        # banded W pass (see the NV12 kernel note)
        for t in range(nwt):
            ws = int(wys[t])
            for h_ref, w_ref in ((yh_ref, w0_ref), (uh_ref, w1_ref),
                                 (vh_ref, w2_ref)):
                w_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                    h_ref[:DH, ws:ws + wy_winw],
                    wyb_ref[t].astype(cdt), precision=prec,
                    preferred_element_type=jnp.float32)
        yv = w0_ref[:, :DW] - y_off
        uw = w1_ref[:, :DW] - 128.0
        vw = w2_ref[:, :DW] - 128.0

        r = m[0, 0] * yv + m[0, 1] * uw + m[0, 2] * vw
        g = m[1, 0] * yv + m[1, 1] * uw + m[1, 2] * vw
        b = m[2, 0] * yv + m[2, 1] * uw + m[2, 2] * vw
        if is_u8:
            for idx, ch in ((0, r), (1, g), (2, b)):
                out_ref[0, idx] = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(
                    jnp.int32).astype(jnp.uint8)
        else:
            for idx, ch in ((0, r), (1, g), (2, b)):
                val = ch / 255.0
                if norm_mean is not None:
                    val = (val - norm_mean[idx]) / norm_std[idx]
                out_ref[0, idx] = val.astype(out_ref.dtype)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    plane_spec = pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                              memory_space=pltpu.VMEM)
    dwp = nwt * LANE_TILE
    flops = B * (3 * n_tiles * TILE * y_win * W
                 + 3 * DH * nwt * wy_winw * LANE_TILE) * 2
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[plane_spec, plane_spec, plane_spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((DH, dwp), jnp.float32),
            pltpu.VMEM((DH, dwp), jnp.float32),
            pltpu.VMEM((DH, dwp), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(y.size * 3) + B * 3 * DH * DW,
            transcendentals=0),
        interpret=interpret,
    )(y, u, v, jnp.asarray(y_blocks), wy_blocks)
    return out


def staging_pad_rows(fmt, src_w: int, src_h: int, dst_h: int,
                     method: str = LANCZOS_AA):
    """Per-plane extra rows the Pallas kernels want pre-padded into
    staging buffers (one tuple entry per storage plane), or None when no
    kernel covers the format. Pre-padding on the host (where a staging
    copy happens anyway) saves the kernels a device-side jnp.pad copy of
    every plane."""
    from ..core.enums import PixelFormat

    fmt = PixelFormat(fmt)
    if fmt in (PixelFormat.NV12, PixelFormat.P10, PixelFormat.P12):
        return (required_pad_rows(src_w, src_h, dst_h, method),)
    if fmt in (PixelFormat.YUV420, PixelFormat.YUV420_10bit):
        ypad, cpad = required_pad_rows_yuv420(src_w, src_h, dst_h, method)
        return (ypad, cpad, cpad)
    if fmt == PixelFormat.YUV422:
        p = required_pad_rows_yuv422(src_w, src_h, dst_h, method)
        return (p, p, p)
    if fmt == PixelFormat.YUV444:
        p = required_pad_rows_yuv444(src_w, src_h, dst_h, method)
        return (p, p, p)
    return None


def pallas_preprocess_formats():
    """The formats a banded Pallas preprocess kernel covers — the single
    source of truth shared by the pipeline's staging decision
    (multistream._pallas_usable), staging_pad_rows, and the
    pallas_preprocess dispatch below. Keeping all three keyed off one set
    means a new format cannot end up host-padded for a kernel that never
    runs (padded planes silently fed to the XLA path would shift the
    chroma split)."""
    from ..core.enums import PixelFormat

    return frozenset({
        PixelFormat.NV12, PixelFormat.P10, PixelFormat.P12,
        PixelFormat.YUV420, PixelFormat.YUV420_10bit,
        PixelFormat.YUV422, PixelFormat.YUV444,
    })


def pallas_preprocess(planes, fmt, *, src_w, src_h, dst_w, dst_h,
                      space, crange, out_dtype, method, normalize):
    """Dispatch the banded fused CSC+resize kernel for ``fmt``.

    Every format in :func:`pallas_preprocess_formats` has a branch here;
    an uncovered format raises instead of letting a caller fall back to
    the XLA path with pad rows baked into the planes. Output is planar
    [B, 3, dst_h, dst_w] (callers moveaxis for interleaved)."""
    from ..core.enums import PixelFormat

    fmt = PixelFormat(fmt)
    if fmt in (PixelFormat.NV12, PixelFormat.P10, PixelFormat.P12):
        return pallas_nv12_preprocess(
            planes[0], src_w=src_w, src_h=src_h, dst_w=dst_w, dst_h=dst_h,
            space=space, crange=crange, out_dtype=out_dtype, method=method,
            normalize=normalize)
    if fmt in (PixelFormat.YUV420, PixelFormat.YUV420_10bit):
        bd = 10 if fmt == PixelFormat.YUV420_10bit else 8
        return pallas_yuv420_preprocess(
            planes[0], planes[1], planes[2], src_w=src_w, src_h=src_h,
            dst_w=dst_w, dst_h=dst_h, space=space, crange=crange,
            out_dtype=out_dtype, method=method, normalize=normalize,
            bit_depth=bd)
    if fmt == PixelFormat.YUV422:
        return pallas_yuv422_preprocess(
            planes[0], planes[1], planes[2], src_w=src_w, src_h=src_h,
            dst_w=dst_w, dst_h=dst_h, space=space, crange=crange,
            out_dtype=out_dtype, method=method, normalize=normalize)
    if fmt == PixelFormat.YUV444:
        return pallas_yuv444_preprocess(
            planes[0], planes[1], planes[2], src_w=src_w, src_h=src_h,
            dst_w=dst_w, dst_h=dst_h, space=space, crange=crange,
            out_dtype=out_dtype, method=method, normalize=normalize)
    raise ValueError(
        f"no Pallas preprocess kernel for {fmt!r} — "
        f"pallas_preprocess_formats() is out of sync with this dispatch")


def required_pad_rows_yuv422(src_w: int, src_h: int, dst_h: int,
                             method: str = LANCZOS_AA) -> int:
    """Extra rows (beyond H) each YUV422 plane must carry (chroma shares
    the luma row weights — full-height planes)."""
    _, _, _, y_end = _banded_h_weights(src_h, dst_h, method)
    return max(0, y_end - src_h)


@functools.partial(
    jax.jit,
    static_argnames=("src_w", "src_h", "dst_w", "dst_h", "space", "crange",
                     "out_dtype", "method", "normalize", "interpret",
                     "compute_dtype"))
def pallas_yuv422_preprocess(
    y: jax.Array,  # [B, >= H (+pad), W] uint8
    u: jax.Array,  # [B, >= H (+pad), W/2] uint8 (full height, half width)
    v: jax.Array,
    *,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    space: ColorSpace = ColorSpace.BT_709,
    crange: ColorRange = ColorRange.MPEG,
    out_dtype=jnp.uint8,
    method: str = LANCZOS_AA,
    normalize=None,
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Planar YUV422 batch -> planar RGB [B, 3, dst_h, dst_w].

    4:2:2 chroma is full height / half width, so the luma row weights
    serve the chroma H-pass and only the W-pass differs (half-width
    resample with 4:2:x horizontal siting). ``compute_dtype``: bfloat16
    (uint8 default) or float32 (the exactness knob) — see the NV12
    kernel docstring.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = y.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    HW = W // 2
    if (y.shape[1] < H or y.shape[2] != W or u.shape[1] < H
            or u.shape[2] != HW or u.shape != v.shape):
        raise ValueError(
            f"Plane shapes {y.shape}/{u.shape}/{v.shape} do not match "
            f"YUV422 {W}x{H}")

    y_starts, y_blocks, y_win, y_end = _banded_h_weights(
        H, DH, method, rows_have=min(y.shape[1], u.shape[1]))
    if y.shape[1] < y_end:
        y = jnp.pad(y, ((0, 0), (0, y_end - y.shape[1]), (0, 0)))
    if u.shape[1] < y_end:
        u = jnp.pad(u, ((0, 0), (0, y_end - u.shape[1]), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, y_end - v.shape[1]), (0, 0)))
    rows = y.shape[1]

    cdt = _resolve_compute_dtype(compute_dtype)
    f32_compute = cdt == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_compute else None

    wys, wyb, wy_winw, _ = _banded_blocks_from_dense(
        _w_weights(W, DW, method).T, LANE_TILE, LANE_ALIGN, W,
        clamp_to_extent=True)
    wy_blocks = jnp.asarray(np.transpose(wyb, (0, 2, 1)).copy()).astype(cdt)
    wcs, wcb, wc_winw, _ = _banded_blocks_from_dense(
        _plain_w_weights_half(W, DW, method).T, LANE_TILE, LANE_ALIGN, HW,
        clamp_to_extent=True)
    wc_blocks = jnp.asarray(np.transpose(wcb, (0, 2, 1)).copy()).astype(cdt)
    nwt = wyb.shape[0]
    n_tiles = y_blocks.shape[0]

    mo = colors.yuv2rgb_matrix(space, crange)
    if mo is None:
        raise ValueError(f"Unsupported cc combo {space}/{crange}")
    m, y_off = mo
    m = m.astype(np.float32)
    is_u8 = np.dtype(out_dtype) == np.uint8
    if normalize is not None and is_u8:
        raise ValueError("normalize requires a float out_dtype")
    norm_mean = tuple(float(x) for x in normalize[0]) if normalize else None
    norm_std = tuple(float(x) for x in normalize[1]) if normalize else None

    def _to_compute(x):
        if f32_compute:  # the exact wide chain: u8 -> i32 -> f32
            return x.astype(jnp.int32).astype(jnp.float32)
        # u8 -> i16 -> bf16: shortest Mosaic-supported exact chain
        return x.astype(jnp.int16).astype(cdt)

    def kernel(y_ref, u_ref, v_ref, yblk_ref, wyb_ref, wcb_ref, out_ref,
               yh_ref, uh_ref, vh_ref, w0_ref, w1_ref, w2_ref):
        for t in range(n_tiles):
            ys = int(y_starts[t])
            blk = yblk_ref[t].astype(cdt)
            yh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                blk, _to_compute(y_ref[0, ys:ys + y_win, :]), precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)
            uh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                blk, _to_compute(u_ref[0, ys:ys + y_win, :]), precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)
            vh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                blk, _to_compute(v_ref[0, ys:ys + y_win, :]), precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)

        for t in range(nwt):
            w0_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                yh_ref[:DH, int(wys[t]):int(wys[t]) + wy_winw],
                wyb_ref[t].astype(cdt), precision=prec,
                preferred_element_type=jnp.float32)
            cs2 = int(wcs[t])
            w1_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                uh_ref[:DH, cs2:cs2 + wc_winw],
                wcb_ref[t].astype(cdt), precision=prec,
                preferred_element_type=jnp.float32)
            w2_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                vh_ref[:DH, cs2:cs2 + wc_winw],
                wcb_ref[t].astype(cdt), precision=prec,
                preferred_element_type=jnp.float32)
        yv = w0_ref[:, :DW] - y_off
        uw = w1_ref[:, :DW] - 128.0
        vw = w2_ref[:, :DW] - 128.0

        r = m[0, 0] * yv + m[0, 1] * uw + m[0, 2] * vw
        g = m[1, 0] * yv + m[1, 1] * uw + m[1, 2] * vw
        b = m[2, 0] * yv + m[2, 1] * uw + m[2, 2] * vw
        if is_u8:
            for idx, ch in ((0, r), (1, g), (2, b)):
                out_ref[0, idx] = jnp.clip(jnp.round(ch), 0.0, 255.0).astype(
                    jnp.int32).astype(jnp.uint8)
        else:
            for idx, ch in ((0, r), (1, g), (2, b)):
                val = ch / 255.0
                if norm_mean is not None:
                    val = (val - norm_mean[idx]) / norm_std[idx]
                out_ref[0, idx] = val.astype(out_ref.dtype)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    dwp = nwt * LANE_TILE
    flops = B * (n_tiles * TILE * y_win * (W + 2 * HW)
                 + DH * nwt * (wy_winw + 2 * wc_winw) * LANE_TILE) * 2
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, HW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, HW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dh_pad, HW), cdt),
            pltpu.VMEM((dh_pad, HW), cdt),
            pltpu.VMEM((DH, dwp), jnp.float32),
            pltpu.VMEM((DH, dwp), jnp.float32),
            pltpu.VMEM((DH, dwp), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(y.size + u.size + v.size) + B * 3 * DH * DW,
            transcendentals=0),
        interpret=interpret,
    )(y, u, v, jnp.asarray(y_blocks), wy_blocks, wc_blocks)
    return out


def _plain_w_weights_half(full_w: int, n_out: int, method: str) -> np.ndarray:
    """[W/2, DW] chroma W-pass weights for planar (non-interleaved) chroma."""
    from .fused import _chroma_weights

    return _chroma_weights(full_w // 2, n_out, full_w, method).T.copy()


def required_pad_rows_yuv420(src_w: int, src_h: int, dst_h: int,
                             method: str = LANCZOS_AA):
    """(luma_pad, chroma_pad) extra rows for the planar-YUV420 kernel."""
    _, _, _, y_end = _banded_h_weights(src_h, dst_h, method)
    _, _, _, c_end = _banded_h_weights(src_h // 2, dst_h, method,
                                       chroma_of=src_h)
    return max(0, y_end - src_h), max(0, c_end - src_h // 2)


@functools.partial(
    jax.jit,
    static_argnames=("src_w", "src_h", "dst_w", "dst_h", "space", "crange",
                     "out_dtype", "method", "normalize", "bit_depth",
                     "interpret", "compute_dtype"))
def pallas_yuv420_preprocess(
    y: jax.Array,  # [B, >= H (+pad), W] uint8 / uint16 (LSB-aligned
                   # 10/12-bit, the software decoder's YUV420_10bit layout)
    u: jax.Array,  # [B, >= H/2 (+pad), W/2]
    v: jax.Array,
    *,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    space: ColorSpace = ColorSpace.BT_709,
    crange: ColorRange = ColorRange.MPEG,
    out_dtype=jnp.uint8,
    method: str = LANCZOS_AA,
    normalize=None,
    bit_depth=None,
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Planar I420 batch -> planar RGB [B, 3, dst_h, dst_w].

    Same banded design as the NV12 kernel; planar chroma needs no
    interleave trick, the half-width planes resample directly. uint16
    input always computes in float32 (bit_depth defaults to 10);
    ``compute_dtype``: bfloat16 (uint8 default) or float32 (the
    exactness knob) — see the NV12 kernel docstring.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = y.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    HW = W // 2
    if (y.shape[1] < H or y.shape[2] != W or u.shape[1] < H // 2
            or u.shape[2] != HW or u.shape != v.shape):
        raise ValueError(
            f"Plane shapes {y.shape}/{u.shape}/{v.shape} do not match "
            f"YUV420 {W}x{H}")

    y_starts, y_blocks, y_win, y_end = _banded_h_weights(
        H, DH, method, rows_have=y.shape[1])
    c_starts, c_blocks, c_win, c_end = _banded_h_weights(
        H // 2, DH, method, chroma_of=H, rows_have=u.shape[1])
    if y.shape[1] < y_end:
        y = jnp.pad(y, ((0, 0), (0, y_end - y.shape[1]), (0, 0)))
    if u.shape[1] < c_end:
        u = jnp.pad(u, ((0, 0), (0, c_end - u.shape[1]), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, c_end - v.shape[1]), (0, 0)))
    y_rows, c_rows = y.shape[1], u.shape[1]

    hbd = np.dtype(y.dtype) == np.uint16  # LSB-aligned high bit depth
    if bit_depth is None:
        bit_depth = 10 if hbd else 8
    scale = float(1 << (bit_depth - 8))
    cdt = _resolve_compute_dtype(compute_dtype, hbd)
    f32_compute = cdt == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_compute else None

    wys, wyb, wy_winw, _ = _banded_blocks_from_dense(
        _w_weights(W, DW, method).T, LANE_TILE, LANE_ALIGN, W,
        clamp_to_extent=True)
    wy_blocks = jnp.asarray(np.transpose(wyb, (0, 2, 1)).copy()).astype(cdt)
    wcs, wcb, wc_winw, _ = _banded_blocks_from_dense(
        _plain_w_weights_half(W, DW, method).T, LANE_TILE, LANE_ALIGN, HW,
        clamp_to_extent=True)
    wc_blocks = jnp.asarray(np.transpose(wcb, (0, 2, 1)).copy()).astype(cdt)
    nwt = wyb.shape[0]
    n_tiles = y_blocks.shape[0]

    mo = colors.yuv2rgb_matrix(space, crange)
    if mo is None:
        raise ValueError(f"Unsupported cc combo {space}/{crange}")
    m, y_off = mo
    m = m.astype(np.float32)
    is_u8 = np.dtype(out_dtype) == np.uint8
    if normalize is not None and is_u8:
        raise ValueError("normalize requires a float out_dtype")
    norm_mean = tuple(float(v) for v in normalize[0]) if normalize else None
    norm_std = tuple(float(v) for v in normalize[1]) if normalize else None

    def _to_compute(x):
        if hbd or f32_compute:  # the wide chain: u8/u16 -> i32 -> f32
            return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)
        return x.astype(jnp.int16).astype(cdt)

    def kernel(y_ref, u_ref, v_ref, yblk_ref, cblk_ref, wyb_ref, wcb_ref,
               out_ref, yh_ref, uh_ref, vh_ref, w0_ref, w1_ref, w2_ref):
        # static windows, unrolled (see the NV12 kernel note)
        for t in range(n_tiles):
            ys, cs = int(y_starts[t]), int(c_starts[t])
            yblk = yblk_ref[t].astype(cdt)
            cblk = cblk_ref[t].astype(cdt)
            yh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                yblk, _to_compute(y_ref[0, ys:ys + y_win, :]),
                precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)
            uh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                cblk, _to_compute(u_ref[0, cs:cs + c_win, :]),
                precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)
            vh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                cblk, _to_compute(v_ref[0, cs:cs + c_win, :]),
                precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)

        for t in range(nwt):
            w0_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                yh_ref[:DH, int(wys[t]):int(wys[t]) + wy_winw],
                wyb_ref[t].astype(cdt), precision=prec,
                preferred_element_type=jnp.float32)
            cs2 = int(wcs[t])
            w1_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                uh_ref[:DH, cs2:cs2 + wc_winw], wcb_ref[t].astype(cdt),
                precision=prec,
                preferred_element_type=jnp.float32)
            w2_ref[:, t * LANE_TILE:(t + 1) * LANE_TILE] = jnp.dot(
                vh_ref[:DH, cs2:cs2 + wc_winw], wcb_ref[t].astype(cdt),
                precision=prec,
                preferred_element_type=jnp.float32)
        yv = w0_ref[:, :DW] - y_off * scale
        uw = w1_ref[:, :DW] - 128.0 * scale
        vw = w2_ref[:, :DW] - 128.0 * scale

        r = m[0, 0] * yv + m[0, 1] * uw + m[0, 2] * vw
        g = m[1, 0] * yv + m[1, 1] * uw + m[1, 2] * vw
        b = m[2, 0] * yv + m[2, 1] * uw + m[2, 2] * vw
        if is_u8:
            for idx, ch in ((0, r), (1, g), (2, b)):
                out_ref[0, idx] = jnp.clip(jnp.round(ch / scale), 0.0,
                                           255.0).astype(
                    jnp.int32).astype(jnp.uint8)
        else:
            for idx, ch in ((0, r), (1, g), (2, b)):
                val = ch / (255.0 * scale)
                if norm_mean is not None:
                    val = (val - norm_mean[idx]) / norm_std[idx]
                out_ref[0, idx] = val.astype(out_ref.dtype)

    dh_pad = ((DH + TILE - 1) // TILE) * TILE
    dwp = nwt * LANE_TILE

    flops = B * (n_tiles * TILE * (y_win * W + 2 * c_win * HW) * 2
                 + DH * nwt * (wy_winw + 2 * wc_winw) * LANE_TILE * 2)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, y_rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_rows, HW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_rows, HW), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, DH, DW), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dh_pad, HW), cdt),
            pltpu.VMEM((dh_pad, HW), cdt),
            pltpu.VMEM((DH, dwp), jnp.float32),
            pltpu.VMEM((DH, dwp), jnp.float32),
            pltpu.VMEM((DH, dwp), jnp.float32),
        ],
        out_shape=jax.ShapeDtypeStruct((B, 3, DH, DW), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(y.size + u.size + v.size) + B * 3 * DH * DW,
            transcendentals=0),
        interpret=interpret,
    )(y, u, v, jnp.asarray(y_blocks), jnp.asarray(c_blocks), wy_blocks,
      wc_blocks)
    return out


# ---------------------------------------------------------------------------
# Banded NV12 -> NV12 resize (throughput path for transcode / 4K -> 1080p)
# ---------------------------------------------------------------------------

LANE_TILE = 128   # output columns per banded W-pass step (lane tiling)
LANE_ALIGN = 128  # W-pass window starts stay on vreg lane boundaries


def _banded_blocks_from_dense(wdense: np.ndarray, tile: int, align: int,
                              extent: int, row_offset: int = 0,
                              clamp_to_extent: bool = False):
    """Slice a dense [n_out, n_in] resize matrix into per-tile banded
    blocks with aligned window starts.

    Returns (starts [n_tiles] absolute storage offsets, blocks
    [n_tiles, tile, win] f32, win, max_end). Window columns outside the
    dense matrix carry zero weights. With clamp_to_extent (lane axis,
    where the input cannot be padded) starts are pulled back so
    start+win <= extent; otherwise max_end tells the caller how much
    padding the storage axis needs.
    """
    n_out, n_in = wdense.shape
    n_tiles = (n_out + tile - 1) // tile
    span = 0
    bands = []
    for t in range(n_tiles):
        rows = wdense[t * tile:(t + 1) * tile]
        nz = np.nonzero(np.abs(rows).sum(axis=0) > 0.0)[0]
        lo, hi = (int(nz[0]), int(nz[-1]) + 1) if len(nz) else (0, 1)
        bands.append((lo, hi))
        span = max(span, hi - lo)
    win = int(math.ceil((span + align) / align)) * align
    dense = False
    if clamp_to_extent:
        # bands live inside the storage extent, so a window of win <
        # extent rows always covers its band once the FINAL window may
        # start unaligned at extent-win (starts are consumed as static
        # slices — unaligned static slices carry no measured Mosaic tax;
        # an aligned-only clamp missed the last extent%align rows and
        # silently forced the pad/dense path for 1080p storage, whose
        # 1620 rows are not a multiple of align=8)
        # ValueError, not assert: an undersized input (e.g. a plane with
        # fewer rows than src_h) must fail loudly — and `python -O`
        # strips asserts, which would silently truncate band tails
        if not all(row_offset + hi <= extent for _, hi in bands):
            bad = [(lo, hi) for lo, hi in bands if row_offset + hi > extent]
            raise ValueError(
                f"resize band(s) {bad[:3]} (+offset {row_offset}) exceed "
                f"the storage extent of {extent} rows — input plane is "
                f"smaller than the declared source size")
        if win >= extent:
            win, dense = extent, True

    starts = np.zeros(n_tiles, dtype=np.int32)
    blocks = np.zeros((n_tiles, tile, win), dtype=np.float32)
    max_end = 0
    for t, (lo, hi) in enumerate(bands):
        start = ((row_offset + lo) // align) * align
        if dense:
            start = 0
        elif clamp_to_extent:
            start = min(start, extent - win)
        start = max(0, start)
        starts[t] = start
        max_end = max(max_end, start + win)
        cols = start - row_offset + np.arange(win)
        valid = (cols >= 0) & (cols < n_in)
        rows = wdense[t * tile:(t + 1) * tile]
        blk = np.zeros((tile, win), dtype=np.float32)
        blk[:rows.shape[0], valid] = rows[:, cols[valid]]
        blocks[t] = blk
    return starts, blocks, win, max_end


def _row_blocks_fit(wdense: np.ndarray, tile: int, align: int,
                    rows_have: int, row_offset: int = 0):
    """Row-axis banded blocks that FIT the available rows when possible.

    Padding a storage plane inside jit costs a full device-side copy of
    the batch (0.5 ms for a 64x1080p NV12 batch) on every call from an
    unpadded caller, so prefer pulling window starts back into the
    array (clamp; zero weights cover the shift — bit-identical). Falls
    back to requesting padding only when clamping would collapse to a
    dense window (inputs smaller than one window).

    Returns (starts, blocks, win, rows_required) — rows_required >
    rows_have means the caller must pad to that many rows first.
    """
    starts, blocks, win, end = _banded_blocks_from_dense(
        wdense, tile, align, rows_have, row_offset=row_offset)
    if end <= rows_have:
        return starts, blocks, win, rows_have
    cs, cb, cwin, _ = _banded_blocks_from_dense(
        wdense, tile, align, rows_have, row_offset=row_offset,
        clamp_to_extent=True)
    if cwin < rows_have:
        return cs, cb, cwin, rows_have
    return starts, blocks, win, end


def _interleave_w_blocks(wdense_half: np.ndarray, full_in_w: int,
                         full_out_w: int, tile: int, align: int):
    """Chroma W-pass blocks consuming AND producing interleaved UV lanes.

    Built by expanding the half-grid matrix into a dense parity pattern
    (U on even in/out lanes, V on odd) and slicing banded blocks with
    the shared dense-slicer — no custom band/clamp logic to drift.
    Returns (starts, blocks [n_tiles, win, tile], win).
    """
    dense = np.zeros((full_out_w, full_in_w), dtype=np.float32)
    dense[0::2, 0::2] = wdense_half
    dense[1::2, 1::2] = wdense_half
    starts, blocks, win, _ = _banded_blocks_from_dense(
        dense, tile, align, full_in_w, clamp_to_extent=True)
    return starts, np.transpose(blocks, (0, 2, 1)).copy(), win


def required_pad_rows_resize(src_w: int, src_h: int, dst_w: int, dst_h: int,
                             method: str = LANCZOS_AA,
                             h_align: int = 8) -> int:
    """Extra rows (beyond H*3/2) the resize kernel input must carry."""
    from .resize import resize_weights

    wy = resize_weights(src_h, dst_h, method)
    wc = resize_weights(src_h // 2, dst_h // 2, method)
    _, _, _, y_end = _banded_blocks_from_dense(wy, TILE, h_align,
                                               src_h * 3 // 2)
    _, _, _, c_end = _banded_blocks_from_dense(wc, TILE, h_align,
                                               src_h * 3 // 2,
                                               row_offset=src_h)
    return max(0, max(y_end, c_end) - src_h * 3 // 2)


@functools.partial(
    jax.jit,
    static_argnames=("src_w", "src_h", "dst_w", "dst_h", "method",
                     "h_tile", "w_tile", "h_align", "w_align",
                     "interpret", "compute_dtype"))
def pallas_nv12_resize(
    nv12: jax.Array,  # [B, >= H*3/2 (+pad), W] uint8 / uint16 (P10/P12)
    *,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    method: str = LANCZOS_AA,
    h_tile: int = TILE,  # rows per H-pass tile; 32 measured best at 4K
    w_tile: int = LANE_TILE,  # output lanes per W-pass tile
    h_align: int = 8,   # H-window start alignment (rows)
    w_align: int = 32,  # W-window start alignment (lanes)
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Banded NV12/P10/P12 resize -> [B, dst_h*3/2, dst_w], same dtype.

    Mirrors resize_batch's NV12 semantics (plane-wise Lanczos, chroma as
    an independent half-res image — reference ancestor
    TaskResizeSurface.cpp:132-188) but runs both separable passes as
    banded matmuls in one Pallas kernel: for 4K -> 1080p the H-pass
    touches ~88 of 2160 rows per 32-row output tile and the W-pass ~320
    of 3840 lanes per 128-lane tile, ~10x fewer MACs than the dense
    einsum path. uint8 computes in bfloat16 by default — this kernel
    is genuinely MXU-MAC-bound, f32 measured 1.86x slower (0.755 vs
    0.407 ms/16-frame 4K batch, f32_ab_lab.py 2026-08-19) —
    ``compute_dtype=jnp.float32`` is the exactness knob; uint16
    (P10/P12) always computes in float32.

    h_align/w_align: banded-window start alignment. The kernel is
    MXU-bound at 4K->1080p, so alignment slack is dead MACs: (8, 32)
    measured 28-29 us/frame vs 32.7 at the old (32, 128) on v5e —
    Mosaic handles the unaligned static slices without measurable
    relayout tax (alignment sweep in resize_diag.py; 4,32 within
    noise of 8,32). Bit-identical results for any alignment.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .resize import resize_weights

    B = nv12.shape[0]
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    if nv12.shape[1] < H * 3 // 2 or nv12.shape[2] != W:
        raise ValueError(
            f"NV12 plane shape {nv12.shape} does not match {W}x{H}")
    if DH % 2 or DW % 2:
        raise ValueError("NV12 resize needs even dst dims")
    hbd = np.dtype(nv12.dtype) == np.uint16
    cdt = _resolve_compute_dtype(compute_dtype, hbd)
    f32_compute = cdt == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_compute else None
    cap = 65535.0 if hbd else 255.0
    DC = DH // 2

    # --- H-pass blocks (from the same dense matrices the XLA path uses)
    HT = h_tile
    wy_rows = resize_weights(H, DH, method)
    wc_rows = resize_weights(H // 2, DC, method)
    y_starts, y_blocks, y_win, y_end = _row_blocks_fit(
        wy_rows, HT, h_align, nv12.shape[1])
    c_starts, c_blocks, c_win, c_end = _row_blocks_fit(
        wc_rows, HT, h_align, nv12.shape[1], row_offset=H)
    rows_needed = max(H * 3 // 2, y_end, c_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    nyt, nct = y_blocks.shape[0], c_blocks.shape[0]

    WT = w_tile
    # --- W-pass blocks ([win, WT] so dots are data @ weights)
    wy_cols = resize_weights(W, DW, method)            # [DW, W]
    wc_cols = resize_weights(W // 2, DW // 2, method)  # half grid
    s_, b_, wy_winw, _ = _banded_blocks_from_dense(
        wy_cols, WT, w_align, W, clamp_to_extent=True)
    wy_starts, wy_blocks = s_, np.transpose(b_, (0, 2, 1)).copy()
    nwt = wy_blocks.shape[0]
    wc_starts, wc_blocks, wc_winw = _interleave_w_blocks(
        wc_cols, W, DW, WT, w_align)

    dh_pad = ((DH + HT - 1) // HT) * HT
    dc_pad = ((DC + HT - 1) // HT) * HT
    dw_pad = nwt * WT

    def _to_compute(x):
        if hbd or f32_compute:  # the wide chain: u8/u16 -> i32 -> f32
            return x.astype(jnp.int32).astype(jnp.float32).astype(cdt)
        return x.astype(jnp.int16).astype(cdt)

    def kernel(frame_ref, yblk_ref, cblk_ref, wyb_ref, wcb_ref,
               yout_ref, cout_ref, yh_ref, ch_ref):
        for t in range(nyt):
            ys = int(y_starts[t])
            yh_ref[t * HT:(t + 1) * HT, :] = jnp.dot(
                yblk_ref[t].astype(cdt),
                _to_compute(frame_ref[0, ys:ys + y_win, :]),
                precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)
        for t in range(nct):
            cs = int(c_starts[t])
            ch_ref[t * HT:(t + 1) * HT, :] = jnp.dot(
                cblk_ref[t].astype(cdt),
                _to_compute(frame_ref[0, cs:cs + c_win, :]),
                precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)

        for t in range(nwt):
            ws = int(wy_starts[t])
            acc = jnp.dot(yh_ref[:DH, ws:ws + wy_winw],
                          wyb_ref[t].astype(cdt), precision=prec,
                          preferred_element_type=jnp.float32)
            yout_ref[0, :, t * WT:(t + 1) * WT] = jnp.clip(
                jnp.round(acc), 0.0, cap).astype(jnp.int32).astype(
                yout_ref.dtype)
            cs = int(wc_starts[t])
            accc = jnp.dot(ch_ref[:DC, cs:cs + wc_winw],
                           wcb_ref[t].astype(cdt), precision=prec,
                           preferred_element_type=jnp.float32)
            cout_ref[0, :, t * WT:(t + 1) * WT] = jnp.clip(
                jnp.round(accc), 0.0, cap).astype(jnp.int32).astype(
                cout_ref.dtype)

    flops = B * 2 * (nyt * HT * y_win * W + nct * HT * c_win * W
                     + nwt * WT * wy_winw * DH
                     + nwt * WT * wc_winw * DC)
    y_out, c_out = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, DH, dw_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DC, dw_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((dh_pad, W), cdt),
            pltpu.VMEM((dc_pad, W), cdt),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, DH, dw_pad), nv12.dtype),
            jax.ShapeDtypeStruct((B, DC, dw_pad), nv12.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(nv12.size) + B * (DH + DC) * dw_pad,
            transcendentals=0),
        interpret=interpret,
    )(nv12, jnp.asarray(y_blocks), jnp.asarray(c_blocks),
      jnp.asarray(wy_blocks), jnp.asarray(wc_blocks))
    return jnp.concatenate([y_out[:, :, :DW], c_out[:, :, :DW]], axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("src_h", "dst_h", "dst_w", "method", "h_align",
                     "w_align", "interpret", "compute_dtype"))
def pallas_plane_resize(
    plane: jax.Array,  # [B, H (+pad rows ok), W] uint8 / uint16 / float32
    *,
    src_h: int,
    dst_h: int,
    dst_w: int,
    method: str = LANCZOS_AA,
    h_align: int = 8,
    w_align: int = 32,
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Banded separable resize of independent planes -> [B, dst_h, dst_w].

    The planar-format sibling of pallas_nv12_resize: Y/GRAY12 directly,
    YUV420/422/444 and RGB_PLANAR per plane (stack planes into the batch
    dim for one launch). Same banded blocks sliced from resize_weights,
    so semantics match resize_plane exactly up to compute dtype (uint8
    in bfloat16 by default — MXU-MAC-bound like pallas_nv12_resize,
    where f32 measured 1.86x slower; uint16/float32 in float32;
    ``compute_dtype=jnp.float32`` is the exactness knob).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .resize import resize_weights

    B, _, W = plane.shape
    H, DH, DW = src_h, dst_h, dst_w
    if plane.shape[1] < H:
        raise ValueError(
            f"plane has {plane.shape[1]} rows < src_h={H}")
    dt = np.dtype(plane.dtype)
    hbd = dt.itemsize > 1
    cdt = _resolve_compute_dtype(compute_dtype, hbd)
    f32_compute = cdt == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_compute else None
    if dt == np.uint8:
        cap = 255.0
    elif dt == np.uint16:
        cap = 65535.0
    else:
        cap = None  # float planes: no quantization

    wh = resize_weights(H, DH, method)
    ww = resize_weights(W, DW, method)
    h_starts, h_blocks, h_win, h_end = _row_blocks_fit(
        wh, TILE, h_align, plane.shape[1])
    if plane.shape[1] < h_end:
        plane = jnp.pad(plane, ((0, 0), (0, h_end - plane.shape[1]),
                                (0, 0)))
    rows = plane.shape[1]
    w_starts, w_b, w_win, _ = _banded_blocks_from_dense(
        ww, LANE_TILE, w_align, W, clamp_to_extent=True)
    w_blocks = np.transpose(w_b, (0, 2, 1)).copy()
    nht, nwt = h_blocks.shape[0], w_blocks.shape[0]
    dh_pad = nht * TILE
    dw_pad = nwt * LANE_TILE

    def _to_compute(x):
        if dt == np.uint8:
            if f32_compute:  # the wide chain: u8 -> i32 -> f32
                return x.astype(jnp.int32).astype(jnp.float32)
            return x.astype(jnp.int16).astype(cdt)
        if dt == np.uint16:
            return x.astype(jnp.int32).astype(jnp.float32)
        return x.astype(cdt)

    def kernel(p_ref, hblk_ref, wblk_ref, out_ref, hh_ref):
        for t in range(nht):
            hs = int(h_starts[t])
            hh_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                hblk_ref[t].astype(cdt),
                _to_compute(p_ref[0, hs:hs + h_win, :]),
                precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)
        for t in range(nwt):
            ws = int(w_starts[t])
            acc = jnp.dot(hh_ref[:DH, ws:ws + w_win],
                          wblk_ref[t].astype(cdt), precision=prec,
                          preferred_element_type=jnp.float32)
            if cap is not None:
                acc = jnp.clip(jnp.round(acc), 0.0, cap).astype(
                    jnp.int32)
            out_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = acc.astype(
                out_ref.dtype)

    flops = B * 2 * (nht * TILE * h_win * W + nwt * LANE_TILE * w_win * DH)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, DH, dw_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((dh_pad, W), cdt)],
        out_shape=jax.ShapeDtypeStruct((B, DH, dw_pad), plane.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(plane.size * dt.itemsize)
            + B * DH * dw_pad * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(plane, jnp.asarray(h_blocks), jnp.asarray(w_blocks))
    return out[:, :, :DW]


# ---------------------------------------------------------------------------
# Banded NV12 -> packed RGB/BGR conversion (full resolution, no resize)
# ---------------------------------------------------------------------------
#
# The composed-op path (PySurfaceConverter -> PySurfaceResizer, reference
# TaskConvertSurface.cpp:1036-1086 chained with TaskResizeSurface.cpp) must
# materialize a packed-RGB surface between the two calls. Packed
# interleaved lanes are the hard part on TPU (a [.,.,3]-minor layout runs
# at 3/128 lane occupancy, and Mosaic has no strided lane stores). The
# trick here: the ENTIRE per-pixel pipeline — chroma W-upsample (nearest,
# matching csc.upsample2x_nearest / NPP), the 3x3 CSC matrix, AND the
# RGB interleave — is folded into two banded selection matrices applied
# as lane-tile matmuls:
#
#   out[:, 3j+c] = m[c,0]*y[:, j] + m[c,1]*u[:, 2(j//2)] +
#                  m[c,2]*v[:, 2(j//2)+1] + off[c]
#
# i.e. one matmul over the luma lanes and one over the vertically
# upsampled (banded replication H-pass) interleaved chroma lanes, whose
# weight PATTERNS carry the CSC coefficients. M = src_h rows per matmul.
# Measured (v5e, 64x1080p): 2.35 ms/batch vs 4.25 ms for the XLA
# channel-plane path — bound by the f32 quantization tail + 400 MB
# packed store, not MACs. (A lane_align sweep 8/32/128 -> 2.41/2.49/3.46
# was measured on the BANDED builder before group mode became the
# 128-divisible fast path; it now only applies to the banded fallback,
# and pallas_nv12_to_rgb canonicalizes lane_align when group mode wins.
# Pre-cast and single-K=256-matmul variants measured slower, see
# convert_lab.py.)


def _packed_csc_lane_blocks(W: int, m: np.ndarray, swap: bool,
                            lane_align: int = 32):
    """Banded lane blocks for the fused upsample+CSC+interleave W pass.

    ``lane_align`` trades Mosaic lane-slice alignment against
    zero-weight FLOP tax: a 128-lane output tile only touches ~43 input
    pixels, so aligning windows to 128 pads the contraction ~3x.

    Returns ((ya_starts, ya_blocks [T, win, LT], ya_win),
             (cb_starts, cb_blocks [T, win, LT], cb_win), OWp).
    """
    OW = 3 * W
    OWp = ((OW + LANE_TILE - 1) // LANE_TILE) * LANE_TILE
    j = np.arange(W)
    A = np.zeros((OWp, W), dtype=np.float32)   # [out lanes, luma lanes]
    Bm = np.zeros((OWp, W), dtype=np.float32)  # [out lanes, chroma lanes]
    order = (2, 1, 0) if swap else (0, 1, 2)
    for c_out in range(3):
        c = order[c_out]
        A[3 * j + c_out, j] = m[c, 0]
        Bm[3 * j + c_out, 2 * (j // 2)] = m[c, 1]
        Bm[3 * j + c_out, 2 * (j // 2) + 1] = m[c, 2]
    sa, ba, wina, _ = _banded_blocks_from_dense(
        A, LANE_TILE, lane_align, W, clamp_to_extent=True)
    sb, bb, winb, _ = _banded_blocks_from_dense(
        Bm, LANE_TILE, lane_align, W, clamp_to_extent=True)
    return ((sa, np.transpose(ba, (0, 2, 1)).copy(), wina),
            (sb, np.transpose(bb, (0, 2, 1)).copy(), winb), OWp)


def pallas_nv12_to_rgb(
    nv12: jax.Array,  # [B, >= H*3/2, W] uint8
    *,
    src_w: int,
    src_h: int,
    space: ColorSpace = ColorSpace.BT_709,
    crange: ColorRange = ColorRange.JPEG,
    swap: bool = False,  # True -> BGR
    lane_align: int = 32,
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """NV12 batch -> packed RGB [B, H, W*3] uint8 at full resolution.

    Value parity with csc._nv12_rgb (nearest chroma upsample both axes,
    same CSC matrix); computes in bfloat16 by default, within 1-2 LSB
    of the float32 XLA path (coefficient rounding), like the turbo
    resize paths. ``compute_dtype=jnp.float32`` is the exactness knob
    (precision=HIGHEST, <=1-LSB accumulation ties vs the exact path) —
    f32 runs multiple MXU passes and compiles much slower, so it is
    NOT the default; the same-day lab that claimed f32 was free was
    mislabeled (docs/PERFORMANCE.md lesson 10).

    ``lane_align`` only shapes the banded fallback (W not a multiple of
    128); group mode ignores it, so it is canonicalized here — before
    the jit boundary — to keep distinct values from recompiling
    identical group-mode kernels (~30-240s each through a remote
    tunnel).
    """
    if not (src_w % lane_align == 0 and lane_align >= 128) \
            and src_w % 128 == 0:
        lane_align = 128
    return _pallas_nv12_to_rgb_jit(
        nv12, src_w=src_w, src_h=src_h, space=space, crange=crange,
        swap=swap, lane_align=lane_align, interpret=interpret,
        compute_dtype=compute_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("src_w", "src_h", "space", "crange", "swap",
                     "lane_align", "interpret", "compute_dtype"))
def _pallas_nv12_to_rgb_jit(
    nv12: jax.Array,
    *,
    src_w: int,
    src_h: int,
    space: ColorSpace,
    crange: ColorRange,
    swap: bool,
    lane_align: int,
    interpret: bool,
    compute_dtype=None,
) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B = nv12.shape[0]
    H, W = src_h, src_w
    if nv12.shape[1] < H * 3 // 2 or nv12.shape[2] != W:
        raise ValueError(
            f"NV12 plane shape {nv12.shape} does not match {W}x{H}")
    if np.dtype(nv12.dtype) != np.uint8:
        raise ValueError("pallas_nv12_to_rgb is 8-bit only")
    cdt = _resolve_compute_dtype(compute_dtype, hbd=False)
    f32_compute = cdt == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_compute else None

    mo = colors.yuv2rgb_matrix(space, crange)
    if mo is None:
        raise ValueError(f"Unsupported cc combo {space}/{crange}")
    m, y_off = mo
    m = m.astype(np.float32)

    OW = 3 * W
    # Group mode (the fast path): when W divides into P-pixel groups, a
    # group's 3P output lanes read EXACTLY its P input lanes at an
    # aligned start, and the selection pattern is translation-invariant
    # — ONE shared [P, 3P] block per matrix, full-K aligned matmuls.
    P = lane_align if W % lane_align == 0 and lane_align >= 128 else (
        128 if W % 128 == 0 else 0)
    if P:
        p = np.arange(P)
        order = (2, 1, 0) if swap else (0, 1, 2)
        Ag = np.zeros((P, 3 * P), dtype=np.float32)
        Bg = np.zeros((P, 3 * P), dtype=np.float32)
        for c_out in range(3):
            c = order[c_out]
            Ag[p, 3 * p + c_out] = m[c, 0]
            Bg[2 * (p // 2), 3 * p + c_out] = m[c, 1]
            Bg[2 * (p // 2) + 1, 3 * p + c_out] = m[c, 2]
        n_groups = W // P
        OWp = OW
        ya_s = cb_s = np.arange(n_groups, dtype=np.int32) * P
        ya_b = Ag[None]
        cb_b = Bg[None]
        ya_win = cb_win = P
        nwt = n_groups
        group_lt = 3 * P
    else:
        (ya_s, ya_b, ya_win), (cb_s, cb_b, cb_win), OWp = \
            _packed_csc_lane_blocks(W, m, swap, lane_align)
        nwt = ya_b.shape[0]
        group_lt = LANE_TILE

    # per-lane constant: -(m[c,0]*y_off + (m[c,1]+m[c,2])*128)
    order = (2, 1, 0) if swap else (0, 1, 2)
    off = np.zeros((1, OWp), dtype=np.float32)
    for c_out in range(3):
        c = order[c_out]
        off[0, c_out::3][: W] = -(m[c, 0] * y_off
                                  + (m[c, 1] + m[c, 2]) * 128.0)

    # banded vertical chroma replication: full-res interleaved chroma
    # rows from the half-res plane at storage offset H (nearest: row i
    # reads chroma row i//2, matching csc.upsample2x_nearest)
    R = np.zeros((H, H // 2), dtype=np.float32)
    R[np.arange(H), np.arange(H) // 2] = 1.0
    r_starts, r_blocks, r_win, r_end = _row_blocks_fit(
        R, TILE, 8, nv12.shape[1], row_offset=H)
    n_rt = r_blocks.shape[0]
    rows_needed = max(H * 3 // 2, r_end)
    if nv12.shape[1] < rows_needed:
        nv12 = jnp.pad(nv12, ((0, 0), (0, rows_needed - nv12.shape[1]),
                              (0, 0)))
    rows = nv12.shape[1]
    h_pad = n_rt * TILE

    def _to_compute(x):
        if f32_compute:  # the exact wide chain: u8 -> i32 -> f32
            return x.astype(jnp.int32).astype(jnp.float32)
        return x.astype(jnp.int16).astype(cdt)

    def kernel(frame_ref, rblk_ref, yab_ref, cbb_ref, off_ref, out_ref,
               cf_ref):
        # chroma vertical replication H pass (banded, static windows)
        for t in range(n_rt):
            rs = int(r_starts[t])
            win = _to_compute(frame_ref[0, rs:rs + r_win, :])
            cf_ref[t * TILE:(t + 1) * TILE, :] = jnp.dot(
                rblk_ref[t].astype(cdt), win, precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)

        # fused upsample+CSC+interleave W pass over output lane tiles
        for t in range(nwt):
            ys, cs = int(ya_s[t]), int(cb_s[t])
            bi = 0 if P else t  # group mode shares one block
            yv = _to_compute(frame_ref[0, :H, ys:ys + ya_win])
            acc = jnp.dot(yv, yab_ref[bi].astype(cdt), precision=prec,
                          preferred_element_type=jnp.float32)
            acc = acc + jnp.dot(cf_ref[:H, cs:cs + cb_win],
                                cbb_ref[bi].astype(cdt), precision=prec,
                                preferred_element_type=jnp.float32)
            acc = acc + off_ref[0, t * group_lt:(t + 1) * group_lt]
            out_ref[0, :, t * group_lt:(t + 1) * group_lt] = jnp.clip(
                jnp.round(acc), 0.0, 255.0).astype(jnp.int32).astype(
                jnp.uint8)

    flops = B * 2 * H * nwt * group_lt * (ya_win + cb_win) \
        + B * 2 * n_rt * TILE * r_win * W
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # r_blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ya blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cb blocks
            pl.BlockSpec(memory_space=pltpu.VMEM),  # offsets
        ],
        out_specs=pl.BlockSpec((1, H, OWp), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h_pad, W), cdt)],
        out_shape=jax.ShapeDtypeStruct((B, H, OWp), jnp.uint8),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(nv12.size) + B * H * OWp,
            transcendentals=0),
        interpret=interpret,
    )(nv12, jnp.asarray(r_blocks), jnp.asarray(ya_b).astype(cdt),
      jnp.asarray(cb_b).astype(cdt), jnp.asarray(off))
    return out if OWp == OW else out[:, :, :OW]


@functools.partial(
    jax.jit,
    static_argnames=("src_w", "src_h", "dst_w", "dst_h", "channels",
                     "method", "h_tile", "h_align", "w_align",
                     "interpret", "compute_dtype"))
def pallas_packed_resize(
    plane: jax.Array,  # [B, H (+pad rows ok), W*channels] uint8/uint16/f32
    *,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    channels: int = 3,
    method: str = LANCZOS_AA,
    h_tile: int = TILE,
    h_align: int = 8,
    w_align: int = 32,
    interpret: bool = False,
    compute_dtype=None,
) -> jax.Array:
    """Banded resize of a PACKED interleaved-channel plane (RGB/BGR
    [N, H, W*3]) -> [B, dst_h, dst_w*channels], same dtype.

    The H pass never mixes lanes, so it runs directly on the packed rows
    at dense lane occupancy; the W pass applies a stride-``channels``
    block expansion of the same resize_weights matrix (out lane
    C*p+c reads in lanes C*q+c only), sliced into banded lane blocks by
    the shared dense-slicer. Identical arithmetic to resize_plane's
    channels>1 path up to compute dtype — and none of the [.,.,C]-minor
    intermediates that run XLA at C/128 lane occupancy.

    uint8 computes in bfloat16 by default (within 1 LSB of the f32
    einsum path); ``compute_dtype=jnp.float32`` is the exactness knob
    (<=1-LSB accumulation ties, ~multi-pass MXU cost — see
    docs/PERFORMANCE.md lesson 10); float planes always compute f32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .resize import resize_weights

    B = plane.shape[0]
    C = channels
    H, W, DH, DW = src_h, src_w, dst_h, dst_w
    if plane.shape[2] != W * C:
        raise ValueError(
            f"packed plane has {plane.shape[2]} lanes, expected {W * C}")
    if plane.shape[1] < H:
        raise ValueError(
            f"packed plane has {plane.shape[1]} rows < src_h={H}")
    dt = np.dtype(plane.dtype)
    hbd = dt.itemsize > 1
    cdt = _resolve_compute_dtype(compute_dtype, hbd)
    f32_compute = cdt == jnp.float32
    prec = jax.lax.Precision.HIGHEST if f32_compute else None
    if dt == np.uint8:
        cap = 255.0
    elif dt == np.uint16:
        cap = 65535.0
    else:
        cap = None

    wh = resize_weights(H, DH, method)
    h_starts, h_blocks, h_win, h_end = _row_blocks_fit(
        wh, h_tile, h_align, plane.shape[1])
    if plane.shape[1] < h_end:
        plane = jnp.pad(plane, ((0, 0), (0, h_end - plane.shape[1]),
                                (0, 0)))
    rows = plane.shape[1]

    # stride-C expanded W matrix [DW*C, W*C]
    ww = resize_weights(W, DW, method)
    wexp = np.zeros((DW * C, W * C), dtype=np.float32)
    for c in range(C):
        wexp[c::C, c::C] = ww
    w_starts, w_b, w_win, _ = _banded_blocks_from_dense(
        wexp, LANE_TILE, w_align, W * C, clamp_to_extent=True)
    w_blocks = np.transpose(w_b, (0, 2, 1)).copy()
    nht, nwt = h_blocks.shape[0], w_blocks.shape[0]
    dh_pad = nht * h_tile
    dw_pad = nwt * LANE_TILE

    def _to_compute(x):
        if dt == np.uint8:
            if f32_compute:  # the wide chain: u8 -> i32 -> f32
                return x.astype(jnp.int32).astype(jnp.float32)
            return x.astype(jnp.int16).astype(cdt)
        if dt == np.uint16:
            return x.astype(jnp.int32).astype(jnp.float32)
        return x.astype(cdt)

    def kernel(p_ref, hblk_ref, wblk_ref, out_ref, hh_ref):
        for t in range(nht):
            hs = int(h_starts[t])
            hh_ref[t * h_tile:(t + 1) * h_tile, :] = jnp.dot(
                hblk_ref[t].astype(cdt),
                _to_compute(p_ref[0, hs:hs + h_win, :]),
                precision=prec,
                preferred_element_type=jnp.float32).astype(cdt)
        for t in range(nwt):
            ws = int(w_starts[t])
            acc = jnp.dot(hh_ref[:DH, ws:ws + w_win],
                          wblk_ref[t].astype(cdt), precision=prec,
                          preferred_element_type=jnp.float32)
            if cap is not None:
                acc = jnp.clip(jnp.round(acc), 0.0, cap).astype(jnp.int32)
            out_ref[0, :, t * LANE_TILE:(t + 1) * LANE_TILE] = acc.astype(
                out_ref.dtype)

    flops = B * 2 * (nht * h_tile * h_win * W * C
                     + nwt * LANE_TILE * w_win * DH)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, rows, W * C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, DH, dw_pad), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((dh_pad, W * C), cdt)],
        out_shape=jax.ShapeDtypeStruct((B, DH, dw_pad), plane.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(plane.size * dt.itemsize)
            + B * DH * dw_pad * dt.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(plane, jnp.asarray(h_blocks), jnp.asarray(w_blocks))
    return out[:, :, :DW * C]
