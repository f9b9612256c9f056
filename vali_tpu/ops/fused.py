"""Fused batched video preprocess: CSC + chroma upsample + resize, one pass.

This is the north-star kernel of the TPU build (BASELINE.json): batches of
decoded NV12/YUV420 frames -> model-ready RGB tensors in a single fused XLA
computation. Where the reference chains NPP kernels per frame
(ConvertSurface + ResizeSurface, one CUDA launch each per frame), here the
whole batch is expressed as matmul resampling (MXU) with the 3x3 color
matrix folded in, so XLA emits one fused pass per batch:

    rgb[n,o,p,c] = M[c,:] . [ (Wy_h y Wy_w^T)[n,o,p] - y_off,
                              (Wc_h u Wc_w^T)[n,o,p] - 128,
                              (Wc_h v Wc_w^T)[n,o,p] - 128 ]

The chroma weight matrices go straight from quarter-resolution planes to the
destination grid — upsample and resize never materialize an intermediate
(the reference's UD kernel insight, ResizeUtils.cu, generalized to any
filter).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace, PixelFormat
from . import colors
from .csc import nv12_split
from .resize import LANCZOS_AA, resize_weights


def _chroma_weights(n_in: int, n_out: int, full_res: int, method: str):
    """Weights mapping a subsampled chroma axis (n_in = full_res/2) directly
    onto the n_out destination grid.

    Chroma sample i sits at full-res position 2i + 0.5 (4:2:0 siting);
    destination pixel o samples full-res position (o+0.5)*scale - 0.5.
    Solving in chroma coordinates gives center (pos - 0.5) / 2.
    """
    from .resize import method_conventions, phase_positions

    kern, support, phase, antialias = method_conventions(method)
    scale = full_res / n_out
    dst_pos = phase_positions(n_out, scale, phase)
    centers = (dst_pos - 0.5) / 2.0
    cscale = (full_res / 2) / n_out
    fscale = max(1.0, cscale) if antialias else 1.0
    if kern is None:  # nearest
        w = np.zeros((n_out, n_in), dtype=np.float32)
        idx = np.clip(np.round(centers), 0, n_in - 1).astype(np.int64)
        w[np.arange(n_out), idx] = 1.0
        return w
    pos = np.arange(n_in)[None, :]
    w = kern((pos - centers[:, None]) / fscale)
    s = w.sum(axis=1, keepdims=True)
    return (w / np.where(s == 0.0, 1.0, s)).astype(np.float32)


def fused_preprocess(
    planes: Tuple[jnp.ndarray, ...],
    src_fmt: PixelFormat,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    space: ColorSpace = ColorSpace.BT_709,
    crange: ColorRange = ColorRange.MPEG,
    out_dtype=jnp.uint8,
    planar: bool = False,
    method: str = LANCZOS_AA,
    normalize: Optional[Tuple[Tuple[float, float, float],
                              Tuple[float, float, float]]] = None,
) -> jnp.ndarray:
    """Batched fused NV12/YUV420 -> resized RGB.

    planes: storage-layout batched planes of ``src_fmt``.
    normalize: optional (mean, std) per channel applied after scaling to
    [0,1] — fuses the model's input normalization into the same pass.
    Returns [N, dst_h, dst_w, 3] (or [N, 3, dst_h, dst_w] when planar).
    """
    if normalize is not None and np.dtype(out_dtype) == np.uint8:
        raise ValueError("normalize requires a float out_dtype")
    src_fmt = PixelFormat(src_fmt)
    bit_depth = 8
    if src_fmt in (PixelFormat.NV12, PixelFormat.P10, PixelFormat.P12):
        bit_depth = {PixelFormat.NV12: 8, PixelFormat.P10: 10,
                     PixelFormat.P12: 12}[src_fmt]
        y, u, v = nv12_split(planes[0], src_h)
    elif src_fmt in (PixelFormat.YUV420, PixelFormat.YUV420_10bit):
        bit_depth = 10 if src_fmt == PixelFormat.YUV420_10bit else 8
        y, u, v = planes
        # rows past the nominal plane height are Pallas staging pad
        y = y[:, :src_h]
        u, v = u[:, :src_h // 2], v[:, :src_h // 2]
    elif src_fmt in (PixelFormat.YUV444, PixelFormat.YUV444_10bit):
        bit_depth = 10 if src_fmt == PixelFormat.YUV444_10bit else 8
        y, u, v = (p[:, :src_h] for p in planes)
    elif src_fmt == PixelFormat.YUV422:
        y, u, v = (p[:, :src_h] for p in planes)  # full-h, half-w chroma
    else:
        raise ValueError(f"fused_preprocess does not support {src_fmt.name}")

    mo = colors.yuv2rgb_matrix(space, crange)
    if mo is None:
        raise ValueError(f"Unsupported cc combo {space}/{crange}")
    m, y_off = mo
    m = m.astype(np.float32)
    # "scale" maps an 8-bit-referenced value (offsets, output range) into
    # the input's stored units: LSB 10/12-bit formats store v10 = v8 * 4,
    # P10/P12 store MSB-aligned 16-bit (v16 = v8 * 256).
    if src_fmt in (PixelFormat.P10, PixelFormat.P12):
        scale = 256.0
    else:
        scale = float(1 << (bit_depth - 8))
    c_off = 128.0 * scale
    y_offset = y_off * scale

    wy_h = jnp.asarray(resize_weights(src_h, dst_h, method))
    wy_w = jnp.asarray(resize_weights(src_w, dst_w, method))
    if src_fmt in (PixelFormat.YUV444, PixelFormat.YUV444_10bit):
        wc_h, wc_w = wy_h, wy_w  # full-resolution chroma
    elif src_fmt == PixelFormat.YUV422:
        wc_h = wy_h  # full-height chroma rows
        wc_w = jnp.asarray(_chroma_weights(src_w // 2, dst_w, src_w, method))
    else:
        wc_h = jnp.asarray(_chroma_weights(src_h // 2, dst_h, src_h, method))
        wc_w = jnp.asarray(_chroma_weights(src_w // 2, dst_w, src_w, method))

    def resample(p, wh, ww):
        t = jnp.einsum("oh,nhw->now", wh, p.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("now,pw->nop", t, ww,
                          preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    yr = resample(y, wy_h, wy_w) - y_offset
    ur = resample(u, wc_h, wc_w) - c_off
    vr = resample(v, wc_h, wc_w) - c_off

    r = m[0, 0] * yr + m[0, 1] * ur + m[0, 2] * vr
    g = m[1, 0] * yr + m[1, 1] * ur + m[1, 2] * vr
    b = m[2, 0] * yr + m[2, 1] * ur + m[2, 2] * vr
    rgb = jnp.stack([r, g, b], axis=-1)

    if np.dtype(out_dtype) == np.uint8:
        # rgb is in the input's stored units; divide back to 8-bit range
        rgb = jnp.clip(jnp.round(rgb / scale), 0.0, 255.0).astype(jnp.uint8)
    else:
        # float output scaled to [0, 1]
        rgb = (rgb / (scale * 255.0)).astype(out_dtype)
        if normalize is not None:
            mean = jnp.asarray(normalize[0], dtype=out_dtype)
            std = jnp.asarray(normalize[1], dtype=out_dtype)
            rgb = (rgb - mean) / std
    if planar:
        rgb = jnp.moveaxis(rgb, -1, 1)
    return rgb


def letterbox_params(src_w: int, src_h: int, dst_w: int, dst_h: int
                     ) -> Tuple[int, int, int, int, float]:
    """Static letterbox geometry: aspect-preserving fit of (src_w, src_h)
    inside (dst_w, dst_h), centered.

    Returns ``(inner_w, inner_h, left, top, scale)`` — the resized content
    size, the pad offsets of its top-left corner, and the scale factor.
    Callers map model outputs (boxes, masks) back to source coordinates
    with ``src = (dst - (left, top)) / scale``.

    ``scale`` is the pre-rounding fit ratio (the YOLO-family convention),
    while ``inner_w``/``inner_h`` are round()ed — so the actual resample
    ratio can differ by up to half a pixel at the far edges for non-exact
    geometries. Callers needing exact back-mapping should use the
    per-axis effective scales ``inner_w / src_w`` and ``inner_h / src_h``
    instead of the returned ``scale``.

    All values are plain Python numbers computed from static shapes, so the
    padded output keeps a static shape under jit.
    """
    if src_w <= 0 or src_h <= 0 or dst_w <= 0 or dst_h <= 0:
        raise ValueError(
            f"letterbox_params needs positive sizes, got src {src_w}x{src_h}"
            f" dst {dst_w}x{dst_h}")
    scale = min(dst_w / src_w, dst_h / src_h)
    # round() keeps the common exact cases exact (e.g. 1920x1080 -> 640x360
    # inside 640x640) and is the convention detection stacks use.
    inner_w = max(1, min(dst_w, round(src_w * scale)))
    inner_h = max(1, min(dst_h, round(src_h * scale)))
    left = (dst_w - inner_w) // 2
    top = (dst_h - inner_h) // 2
    return inner_w, inner_h, left, top, scale


def letterbox_preprocess(
    planes: Tuple[jnp.ndarray, ...],
    src_fmt: PixelFormat,
    src_w: int,
    src_h: int,
    dst_w: int,
    dst_h: int,
    space: ColorSpace = ColorSpace.BT_709,
    crange: ColorRange = ColorRange.MPEG,
    out_dtype=jnp.uint8,
    planar: bool = False,
    method: str = LANCZOS_AA,
    normalize: Optional[Tuple[Tuple[float, float, float],
                              Tuple[float, float, float]]] = None,
    pad_value: int = 114,
) -> jnp.ndarray:
    """Batched fused decode-side letterbox: CSC + chroma upsample +
    aspect-preserving resize + centered constant pad.

    The standard detection-serving input path (YOLO-family convention:
    gray 114 pad). The resample itself is :func:`fused_preprocess` onto the
    static inner grid from :func:`letterbox_params`; the pad is a static
    ``dynamic_update_slice`` into a constant canvas. When this composed op
    is traced under one caller jit, XLA fuses the whole thing; the
    pipeline/Pallas route instead runs the inner resample (possibly a
    Pallas kernel) and then :func:`letterbox_pad` as a separate cheap
    jitted canvas update. Either way the output shape stays
    [N, dst_h, dst_w, 3] for every source geometry — one compiled program
    serves mixed-aspect streams at a fixed model input size.

    ``pad_value`` is in 8-bit display units regardless of src bit depth or
    out_dtype; float outputs get ``pad_value/255`` pushed through the same
    normalize transform as the content so the canvas is what the model
    expects. Returns the padded batch; use :func:`letterbox_params` for the
    box-mapping geometry. No reference counterpart (beyond-parity; the
    reference resizes anisotropically — ResizeSurface, ResizeUtils.cu).
    """
    inner_w, inner_h, left, top, _ = letterbox_params(
        src_w, src_h, dst_w, dst_h)
    inner = fused_preprocess(planes, src_fmt, src_w, src_h, inner_w,
                             inner_h, space, crange, out_dtype, False,
                             method, normalize)
    return letterbox_pad(inner, dst_w, dst_h, left, top,
                         pad_value=pad_value, normalize=normalize,
                         planar=planar)


def letterbox_pad(inner: jnp.ndarray, dst_w: int, dst_h: int, left: int,
                  top: int, *, pad_value: int = 114, normalize=None,
                  planar: bool = False) -> jnp.ndarray:
    """Place a channel-last [N, h, w, 3] content block onto a constant
    [N, dst_h, dst_w, 3] canvas at a static offset (the pad half of
    :func:`letterbox_preprocess`, reused by pipeline routes whose content
    resample runs in a Pallas kernel). ``pad_value`` semantics match
    letterbox_preprocess; the canvas dtype follows ``inner.dtype``."""
    out_dtype = inner.dtype
    n = inner.shape[0]
    if np.dtype(out_dtype) == np.uint8:
        fill = jnp.full((3,), np.uint8(np.clip(pad_value, 0, 255)),
                        dtype=jnp.uint8)
    else:
        fill = jnp.full((3,), pad_value / 255.0, dtype=out_dtype)
        if normalize is not None:
            mean = jnp.asarray(normalize[0], dtype=out_dtype)
            std = jnp.asarray(normalize[1], dtype=out_dtype)
            fill = ((fill - mean) / std).astype(out_dtype)
    canvas = jnp.broadcast_to(fill, (n, dst_h, dst_w, 3)).astype(out_dtype)
    rgb = jax.lax.dynamic_update_slice(canvas, inner, (0, top, left, 0))
    if planar:
        rgb = jnp.moveaxis(rgb, -1, 1)
    return rgb
