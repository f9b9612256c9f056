"""Batched color-space / pixel-format conversions (the ConvertSurface op).

TPU-native redesign of the reference's 23-pair NPP dispatch
(reference src/TC/src/TaskConvertSurface.cpp:966-1086): every conversion is a
pure function over BATCHED plane arrays ``[N, Hp, Wp]`` built from jnp ops,
so XLA fuses the whole chain (dtype widen -> chroma upsample -> 3x3 channel
matmul -> clamp -> narrow) into one pass over HBM. Single-surface calls are
the N=1 special case; the multi-stream pipeline feeds N=64 batches.

The supported pair list and the per-pair (color space x range) support
matrix mirror the reference exactly — including its quirks (e.g. NV12->RGB
rejects BT_601+MPEG, YUV444->RGB is BT_601+JPEG only) so the error-path
tests port over.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import ColorRange, ColorSpace, PixelFormat
from . import colors

_J = ColorRange.JPEG
_M = ColorRange.MPEG
_601 = ColorSpace.BT_601
_709 = ColorSpace.BT_709


class UnsupportedConversionParams(ValueError):
    """Raised when (src,dst) pair is OK but (space, range) combo is not."""


# --------------------------------------------------------------------------
# Layout helpers (all zero-copy / XLA-fusable reshapes)
# --------------------------------------------------------------------------


def nv12_split(plane: jnp.ndarray, height: int):
    """[N, >= H*3/2, W] -> (y [N,H,W], u [N,H/2,W/2], v [N,H/2,W/2]).

    Rows past H*3/2 (Pallas staging pad) are ignored."""
    y = plane[:, :height, :]
    uv = plane[:, height:height * 3 // 2, :]
    n, hc, w = uv.shape
    uv = uv.reshape(n, hc, w // 2, 2)
    return y, uv[..., 0], uv[..., 1]


def nv12_merge(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`nv12_split`."""
    n, hc, wc = u.shape
    uv = jnp.stack([u, v], axis=-1).reshape(n, hc, wc * 2)
    return jnp.concatenate([y, uv], axis=1)


def packed_rgb_view(plane: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W*3] -> [N, H, W, 3]."""
    n, h, w3 = plane.shape
    return plane.reshape(n, h, w3 // 3, 3)


def packed_rgb_store(rgb: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = rgb.shape
    return rgb.reshape(n, h, w * c)


def planar_rgb_view(plane: jnp.ndarray) -> jnp.ndarray:
    """[N, 3H, W] -> [N, H, W, 3]."""
    n, h3, w = plane.shape
    return jnp.moveaxis(plane.reshape(n, 3, h3 // 3, w), 1, -1)


def planar_rgb_store(rgb: jnp.ndarray) -> jnp.ndarray:
    n, h, w, c = rgb.shape
    return jnp.moveaxis(rgb, -1, 1).reshape(n, c * h, w)


def upsample2x_nearest(c: jnp.ndarray, axis_h: int = 1,
                       axis_w: int = 2) -> jnp.ndarray:
    """Chroma 2x replication, matching NPP's 4:2:0 upsampling."""
    return jnp.repeat(jnp.repeat(c, 2, axis=axis_h), 2, axis=axis_w)


def _round_u8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)


def yuv_to_rgb_channels(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                        space: ColorSpace, crange: ColorRange,
                        bit_depth: int = 8) -> Tuple[jnp.ndarray, ...]:
    """Full-resolution YUV planes [N,H,W] -> float32 (r, g, b) planes.

    Channels stay separate [N,H,W] arrays: on TPU a trailing channel dim
    of 3 puts every elementwise op at 3/128 lane occupancy (measured 29
    -> 5.8 ms per 64x1080p batch for NV12->RGB after this layout change;
    see csc_variants.py)."""
    mo = colors.yuv2rgb_matrix(space, crange)
    if mo is None:
        raise UnsupportedConversionParams(
            f"YUV->RGB unsupported for {space.name}+{crange.name}")
    m, y_off = mo
    # bit_depth > 8 means the project-wide MSB-aligned uint16 layout
    # (NVDEC P010/P012: v16 = v8 * 256, regardless of 10 vs 12 bits —
    # see formats.py and decoder.cpp's <<4 repack), so offsets scale by
    # 256. An LSB-aligned 2^(d-8) scaling here once mismatched the only
    # 10/12-bit data the project has (advisor review).
    scale = 256.0 if bit_depth > 8 else 1.0
    c_off = 128.0 * scale
    m = m.astype(np.float32)
    yf = y.astype(jnp.float32) - y_off * scale
    uf = u.astype(jnp.float32) - c_off
    vf = v.astype(jnp.float32) - c_off
    r = m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf
    g = m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf
    b = m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf
    return r, g, b


def rgb_to_yuv_channels(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                        space: ColorSpace,
                        crange: ColorRange) -> Tuple[jnp.ndarray, ...]:
    """float32 (r, g, b) planes -> float32 (y, u, v) planes (full-lane
    layout, see yuv_to_rgb_channels)."""
    mo = colors.rgb2yuv_matrix(space, crange)
    if mo is None:
        raise UnsupportedConversionParams(
            f"RGB->YUV unsupported for {space.name}+{crange.name}")
    m, y_off = mo
    m = m.astype(np.float32)
    y = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b + y_off
    u = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b + 128.0
    v = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b + 128.0
    return y, u, v


def _stage_chroma(u: jnp.ndarray, v: jnp.ndarray):
    """Materialize upsampled chroma behind an optimization barrier.

    Without it XLA re-fuses the strided deinterleave/duplication into
    every consumer channel at pathological layout (measured 21 -> 6 ms
    per 64x1080p NV12->RGB batch on v5e)."""
    return jax.lax.optimization_barrier((u, v))


def unpack_channels(plane: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Packed [N, H, W*3] u8 -> three [N,H,W] channel planes via ONE
    minor-dims relayout, so downstream math runs at full lane width."""
    n, h, w3 = plane.shape
    x = jnp.swapaxes(plane.reshape(n, h, w3 // 3, 3), 2, 3)
    return x[:, :, 0, :], x[:, :, 1, :], x[:, :, 2, :]


def pack_channels(chans) -> jnp.ndarray:
    """Three [N,H,W] planes -> packed [N, H, W*3] via ONE relayout."""
    rgb3 = jnp.stack(list(chans), axis=2)          # [N, H, 3, W], W minor
    n, h, c, w = rgb3.shape
    return jnp.swapaxes(rgb3, 2, 3).reshape(n, h, w * c)


def subsample420(c: jnp.ndarray) -> jnp.ndarray:
    """[N,H,W] -> [N,H/2,W/2] by 2x2 mean."""
    n, h, w = c.shape
    return c.reshape(n, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


# --------------------------------------------------------------------------
# Conversion registry
# --------------------------------------------------------------------------

# impl(planes, width, height, space, crange) -> planes
_Impl = Callable[..., Tuple[jnp.ndarray, ...]]


class _Conv:
    __slots__ = ("impl", "combos", "default")

    def __init__(self, impl: _Impl, combos, default):
        self.impl = impl
        self.combos = combos  # None = colorspace-independent
        self.default = default


_REGISTRY: Dict[Tuple[PixelFormat, PixelFormat], _Conv] = {}


def _register(src: PixelFormat, dst: PixelFormat, combos=None,
              default=(_601, _J)):
    def deco(fn):
        _REGISTRY[(src, dst)] = _Conv(fn, combos, default)
        return fn

    return deco


F = PixelFormat


@_register(F.NV12, F.YUV420)
def _nv12_yuv420(planes, w, h, space, crange):
    y, u, v = nv12_split(planes[0], h)
    return y, u, v


@_register(F.YUV420, F.NV12)
def _yuv420_nv12(planes, w, h, space, crange):
    return (nv12_merge(*planes),)


@_register(F.P10, F.NV12)
@_register(F.P12, F.NV12)
def _p16_nv12(planes, w, h, space, crange):
    # Keep top 8 bits (reference p16_nv12: DivC by 256 + 16u->8u convert).
    return ((planes[0] // 256).astype(jnp.uint8),)


def _nv12_rgb_impl(planes, w, h, space, crange, swap: bool):
    y, u, v = nv12_split(planes[0], h)
    u, v = _stage_chroma(upsample2x_nearest(u), upsample2x_nearest(v))
    r, g, b = yuv_to_rgb_channels(y, u, v, space, crange)
    chans = (b, g, r) if swap else (r, g, b)
    return (pack_channels(_round_u8(c) for c in chans),)


@_register(F.NV12, F.RGB, combos={(_709, _J), (_709, _M), (_601, _J)},
           default=(_709, _J))
def _nv12_rgb(planes, w, h, space, crange):
    return _nv12_rgb_impl(planes, w, h, space, crange, swap=False)


@_register(F.NV12, F.BGR, combos={(_709, _J), (_709, _M), (_601, _J)},
           default=(_709, _J))
def _nv12_bgr(planes, w, h, space, crange):
    return _nv12_rgb_impl(planes, w, h, space, crange, swap=True)


@_register(F.RGB, F.RGB_PLANAR)
def _rgb_deinterleave(planes, w, h, space, crange):
    return (planar_rgb_store(packed_rgb_view(planes[0])),)


@_register(F.RGB_PLANAR, F.RGB)
def _rgb_interleave(planes, w, h, space, crange):
    return (packed_rgb_store(planar_rgb_view(planes[0])),)


@_register(F.RGB_PLANAR, F.YUV444, combos={(_601, _J), (_601, _M)})
def _rgb_planar_yuv444(planes, w, h, space, crange):
    p = planes[0]
    n, h3, _ = p.shape
    hh = h3 // 3
    r = p[:, :hh, :].astype(jnp.float32)
    g = p[:, hh:2 * hh, :].astype(jnp.float32)
    b = p[:, 2 * hh:, :].astype(jnp.float32)
    y, u, v = rgb_to_yuv_channels(r, g, b, space, crange)
    return _round_u8(y), _round_u8(u), _round_u8(v)


@_register(F.Y, F.YUV444)
def _y_yuv444(planes, w, h, space, crange):
    y = planes[0]
    gray = jnp.full_like(y, 128)
    return y, gray, gray


def _yuv420_rgb_impl(planes, w, h, space, crange, swap: bool):
    y, u, v = planes
    u, v = _stage_chroma(upsample2x_nearest(u), upsample2x_nearest(v))
    r, g, b = yuv_to_rgb_channels(y, u, v, space, crange)
    chans = (b, g, r) if swap else (r, g, b)
    return (pack_channels(_round_u8(c) for c in chans),)


@_register(F.YUV420, F.RGB, combos={(_601, _J), (_601, _M)})
def _yuv420_rgb(planes, w, h, space, crange):
    return _yuv420_rgb_impl(planes, w, h, space, crange, swap=False)


@_register(F.YUV420, F.BGR, combos={(_601, _J), (_601, _M)})
def _yuv420_bgr(planes, w, h, space, crange):
    return _yuv420_rgb_impl(planes, w, h, space, crange, swap=True)


@_register(F.RGB, F.YUV420, combos={(_601, _J), (_601, _M)})
def _rgb_yuv420(planes, w, h, space, crange):
    r, g, b = (c.astype(jnp.float32) for c in unpack_channels(planes[0]))
    y, u, v = rgb_to_yuv_channels(r, g, b, space, crange)
    return _round_u8(y), _round_u8(subsample420(u)), _round_u8(subsample420(v))


@_register(F.RGB, F.YUV444, combos={(_601, _J), (_601, _M)})
def _rgb_yuv444(planes, w, h, space, crange):
    r, g, b = (c.astype(jnp.float32) for c in unpack_channels(planes[0]))
    y, u, v = rgb_to_yuv_channels(r, g, b, space, crange)
    return _round_u8(y), _round_u8(u), _round_u8(v)


@_register(F.RGB, F.BGR)
@_register(F.BGR, F.RGB)
def _swap_channels(planes, w, h, space, crange):
    return (packed_rgb_store(packed_rgb_view(planes[0])[..., ::-1]),)


def _yuv444_rgb_impl(planes, w, h, space, crange, swap: bool):
    r, g, b = yuv_to_rgb_channels(*planes, space, crange)
    chans = (b, g, r) if swap else (r, g, b)
    return (pack_channels(_round_u8(c) for c in chans),)


@_register(F.YUV444, F.BGR, combos={(_601, _J), (_601, _M)})
def _yuv444_bgr(planes, w, h, space, crange):
    return _yuv444_rgb_impl(planes, w, h, space, crange, swap=True)


@_register(F.YUV444, F.RGB, combos={(_601, _J)})
def _yuv444_rgb(planes, w, h, space, crange):
    return _yuv444_rgb_impl(planes, w, h, space, crange, swap=False)


@_register(F.BGR, F.YUV444, combos={(_601, _J), (_601, _M)})
def _bgr_yuv444(planes, w, h, space, crange):
    b, g, r = (c.astype(jnp.float32) for c in unpack_channels(planes[0]))
    y, u, v = rgb_to_yuv_channels(r, g, b, space, crange)
    return _round_u8(y), _round_u8(u), _round_u8(v)


@_register(F.NV12, F.Y)
def _nv12_y(planes, w, h, space, crange):
    return (planes[0][:, :h, :],)


@_register(F.RGB, F.RGB_32F)
def _rgb_to_32f(planes, w, h, space, crange):
    # nppiScale_8u32f maps [0,255] -> [0.0, 1.0]
    return (planes[0].astype(jnp.float32) / 255.0,)


@_register(F.RGB, F.Y)
def _rgb_y(planes, w, h, space, crange):
    r, g, b = (c.astype(jnp.float32) for c in unpack_channels(planes[0]))
    wts = colors.GRAY_WEIGHTS.astype(np.float32)
    y = r * wts[0] + g * wts[1] + b * wts[2]
    return (_round_u8(y),)


@_register(F.RGB_32F, F.RGB_32F_PLANAR)
def _rgb32f_deinterleave(planes, w, h, space, crange):
    return (planar_rgb_store(packed_rgb_view(planes[0])),)


# --------------------------------------------------------------------------
# Public entry points
# --------------------------------------------------------------------------


def supported_conversions() -> List[Tuple[PixelFormat, PixelFormat]]:
    """Parity with ConvertSurface::GetSupportedConversions
    (TaskConvertSurface.cpp:966-994)."""
    return list(_REGISTRY.keys())


def _pallas_convert_usable() -> bool:
    from ..utils.device import pallas_platform_available

    return pallas_platform_available()


def convert_batch(
    planes: Sequence[jnp.ndarray],
    src_fmt: PixelFormat,
    dst_fmt: PixelFormat,
    width: int,
    height: int,
    cc=None,
    use_pallas: "bool | None" = None,
) -> Tuple[jnp.ndarray, ...]:
    """Convert batched planes [N, Hp, Wp] from src_fmt to dst_fmt.

    On TPU the NV12 -> RGB/BGR pair routes to the banded Pallas
    conversion kernel (ops/pallas_fused.pallas_nv12_to_rgb: the packed
    interleave folded into lane-tile matmuls, ~2x the XLA channel-plane
    path; within 1 LSB — bfloat16 coefficient rounding).
    ``use_pallas=False`` forces the exact XLA path.

    Raises KeyError for unsupported pairs and
    UnsupportedConversionParams for unsupported (space, range) combos.
    """
    src_fmt, dst_fmt = PixelFormat(src_fmt), PixelFormat(dst_fmt)
    conv = _REGISTRY.get((src_fmt, dst_fmt))
    if conv is None:
        raise KeyError(
            f"Conversion {src_fmt.name} -> "
            f"{dst_fmt.name} is not supported")
    space, crange = colors.resolve_cc(cc, *conv.default)
    if conv.combos is not None and (space, crange) not in conv.combos:
        raise UnsupportedConversionParams(
            f"{src_fmt.name}->{dst_fmt.name} does "
            f"not support {space.name}+{crange.name}")
    if use_pallas is None:
        use_pallas = _pallas_convert_usable()
    if (use_pallas and src_fmt == PixelFormat.NV12
            and dst_fmt in (PixelFormat.RGB, PixelFormat.BGR)
            and np.dtype(planes[0].dtype) == np.uint8):
        from .pallas_fused import pallas_nv12_to_rgb

        return (pallas_nv12_to_rgb(
            planes[0], src_w=width, src_h=height, space=space,
            crange=crange, swap=dst_fmt == PixelFormat.BGR),)
    return tuple(conv.impl(tuple(planes), width, height, space, crange))
