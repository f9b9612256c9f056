"""Fused Upsample-Downscale-Convert (the UDSurface op).

Behavioral parity target: the reference's only hand-written CUDA kernel
(src/TC/src/ResizeUtils.cu:21-176) — fused chroma upsample + rescale +
optional YUV->RGB in one pass over the frame, plus the per-plane Lanczos
fallback for planar inputs (src/TC/src/UDSurface.cpp:85-94).

TPU-native formulation: the bilinear texture sampling becomes two dense
weight matmuls (MXU), with the color matrix folded into the same fused XLA
computation, so each batch of frames makes exactly one HBM round trip.
Semantics faithfully reproduce the reference kernel:

  - texture coordinates ``x/scale`` with the CUDA -0.5 texel offset and
    edge clamping (tex_coords weight mode),
  - unorm reads (v / (2^bits - 1)), denormalization by ``2^bits`` with
    truncation (we clamp instead of allowing the reference's 8-bit wrap),
  - the fixed full-range analog-YUV matrix (1.140/0.394/0.581/2.032) with
    no luma offset (ResizeUtils.cu:75-77) regardless of cc context,
  - float outputs stay normalized to [0, 1] (Denormalize<float> is a no-op).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import PixelFormat
from . import colors
from .csc import nv12_split, pack_channels
from .resize import BILINEAR, LANCZOS, resize_plane, resize_weights

F = PixelFormat

#: Parity: UDSurface::SupportedConversions (UDSurface.cpp:117-133).
SUPPORTED_CONVERSIONS: Tuple[Tuple[PixelFormat, PixelFormat], ...] = (
    (F.NV12, F.YUV444),
    (F.NV12, F.RGB),
    (F.NV12, F.RGB_32F),
    (F.NV12, F.RGB_PLANAR),
    (F.NV12, F.RGB_32F_PLANAR),
    (F.YUV420, F.YUV444),
    (F.P10, F.YUV444_10bit),
    (F.P10, F.RGB_32F),
    (F.P10, F.RGB_32F_PLANAR),
    (F.YUV420_10bit, F.YUV444_10bit),
)


def _tex_resize(plane: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resample in float32 using the UD kernel's tex coords."""
    n, h, w = plane.shape
    wh = jnp.asarray(resize_weights(h, out_h, BILINEAR, antialias=False,
                                    phase="tex"))
    ww = jnp.asarray(resize_weights(w, out_w, BILINEAR, antialias=False,
                                    phase="tex"))
    img = plane.astype(jnp.float32)
    tmp = jnp.einsum("oh,nhw->now", wh, img,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("now,pw->nop", tmp, ww,
                      preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)


def ud_batch(planes: Sequence[jnp.ndarray], src_fmt: PixelFormat,
             dst_fmt: PixelFormat, src_w: int, src_h: int,
             dst_w: int, dst_h: int) -> Tuple[jnp.ndarray, ...]:
    """Fused convert+resize of batched storage-layout planes."""
    src_fmt, dst_fmt = PixelFormat(src_fmt), PixelFormat(dst_fmt)
    if (src_fmt, dst_fmt) not in SUPPORTED_CONVERSIONS:
        raise KeyError(
            f"UD conversion {src_fmt.name} -> {dst_fmt.name} not supported")

    # --- planar inputs: per-plane Lanczos resize (UDPlanar fallback) ------
    if src_fmt in (F.YUV420, F.YUV420_10bit):
        return tuple(
            resize_plane(p, dst_h, dst_w, LANCZOS) for p in planes)

    # --- semi-planar (NV12 / P10): the fused texture kernel ---------------
    bits = 8 if src_fmt == F.NV12 else 16
    unorm = float((1 << bits) - 1)
    denorm = float(1 << bits)

    y, u, v = nv12_split(planes[0], src_h)
    y_res = _tex_resize(y, dst_h, dst_w) / unorm
    u_res = _tex_resize(u, dst_h, dst_w) / unorm
    v_res = _tex_resize(v, dst_h, dst_w) / unorm

    if dst_fmt in (F.YUV444, F.YUV444_10bit):
        out_dtype = jnp.uint8 if dst_fmt == F.YUV444 else jnp.uint16
        cap = float((1 << bits) - 1)
        outs: List[jnp.ndarray] = []
        for c in (y_res, u_res, v_res):
            outs.append(jnp.clip(jnp.floor(c * denorm), 0.0, cap)
                        .astype(out_dtype))
        return tuple(outs)

    m = colors.UD_YUV2RGB.astype(np.float32)
    n_u = u_res - 0.5
    n_v = v_res - 0.5
    r = y_res + m[0, 2] * n_v
    g = y_res + m[1, 1] * n_u + m[1, 2] * n_v
    b = y_res + m[2, 1] * n_u

    if dst_fmt in (F.RGB, F.RGB_PLANAR):
        chans = [jnp.clip(jnp.floor(c * denorm), 0.0, 255.0)
                 .astype(jnp.uint8) for c in (r, g, b)]
        if dst_fmt == F.RGB:
            return (pack_channels(chans),)
        return (jnp.concatenate(chans, axis=1),)  # [N, 3H, W] planar

    # Float outputs keep the normalized [0,1] values (Denormalize<float>
    # is a no-op in the reference kernel).
    chans = [c.astype(jnp.float32) for c in (r, g, b)]
    if dst_fmt == F.RGB_32F:
        return (pack_channels(chans),)
    return (jnp.concatenate(chans, axis=1),)
