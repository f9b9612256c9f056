"""Batched rotation (the RotateSurface op).

Parity target: reference src/TC/src/RotateSurface.cpp:22-218
(nppiRotate_*, NPPI_INTER_LINEAR: forward map
``dst = [cos*x + sin*y + sx, -sin*x + cos*y + sy]`` in y-down image coords,
out-of-frame pixels 0). TPU-native implementation:

  - Exact multiples of 90 degrees (the display-rotation path,
    PySurfaceRotator.cpp:47-73) lower to ``jnp.rot90`` — pure data movement
    XLA handles as layout transforms.
  - Arbitrary angles use a bilinear gather over the inverse map, batched
    over frames.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp

from ..core.enums import PixelFormat

#: Parity: PySurfaceRotator::SupportedFormats (PySurfaceRotator.cpp:34-38).
SUPPORTED_FORMATS = (
    PixelFormat.Y, PixelFormat.GRAY12, PixelFormat.RGB, PixelFormat.BGR,
    PixelFormat.RGB_PLANAR, PixelFormat.YUV420, PixelFormat.YUV422,
    PixelFormat.YUV444, PixelFormat.RGB_32F, PixelFormat.RGB_32F_PLANAR,
    PixelFormat.YUV444_10bit, PixelFormat.YUV420_10bit,
)


def normalize_right_angle(angle: float, shift_x: float, shift_y: float,
                          src_w: int, src_h: int):
    """The reference's right-angle normalization
    (PySurfaceRotator.cpp:47-73): for multiples of 90 with no shift, pick
    canonical shifts that land the rotated image at the origin."""
    if math.fmod(angle, 90.0) == 0.0 and shift_x == 0.0 and shift_y == 0.0:
        norm = int(round(angle)) % 360
        if norm == 90:
            return 90.0, 0.0, float(src_w - 1)
        if norm == 180:
            return 180.0, float(src_w - 1), float(src_h - 1)
        if norm == 270:
            return 270.0, float(src_h - 1), 0.0
        return 0.0, 0.0, 0.0
    return angle, shift_x, shift_y


def _is_canonical_right_angle(angle, sx, sy, w, h) -> bool:
    return (angle, sx, sy) in (
        (0.0, 0.0, 0.0),
        (90.0, 0.0, float(w - 1)),
        (180.0, float(w - 1), float(h - 1)),
        (270.0, float(h - 1), 0.0),
    )


def rotate_plane(plane: jnp.ndarray, angle: float, shift_x: float,
                 shift_y: float, out_h: int, out_w: int,
                 channels: int = 1) -> jnp.ndarray:
    """Rotate one batched plane [N, H, W*channels] -> [N, out_h, out_w*ch]."""
    dtype = plane.dtype
    n, h, wc = plane.shape
    w = wc // channels
    src = plane.reshape(n, h, w, channels)

    concrete = all(isinstance(v, (int, float)) for v in
                   (angle, shift_x, shift_y))
    if concrete and _is_canonical_right_angle(angle, shift_x, shift_y,
                                              w, h):
        k = int(angle) // 90
        out = jnp.rot90(src, k=k, axes=(1, 2))
        if (out.shape[1], out.shape[2]) == (out_h, out_w):
            return out.reshape(n, out_h, out_w * channels)
        # requested canvas differs from the rotated extent (mis-sized
        # dst, or an anisotropically-subsampled plane): fall through to
        # the inverse-map sampler, which fills exactly (out_h, out_w)
        # with out-of-frame pixels zeroed — the reference's nppiRotate
        # semantics for a mismatched dst ROI

    # jnp trig so angle/shift may be traced scalars (one compile per
    # shape, not per angle — the reference's nppiRotate takes the angle
    # dynamically too)
    theta = jnp.float32(angle) * jnp.float32(math.pi / 180.0)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    # Inverse of dst_x = cos*x + sin*y + sx ; dst_y = -sin*x + cos*y + sy
    ys = jnp.arange(out_h, dtype=jnp.float32)[:, None] - jnp.float32(shift_y)
    xs = jnp.arange(out_w, dtype=jnp.float32)[None, :] - jnp.float32(shift_x)
    src_x = cos_t * xs - sin_t * ys
    src_y = sin_t * xs + cos_t * ys

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[None, :, :, None]
    fy = (src_y - y0)[None, :, :, None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def sample(yi, xi):
        inside = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        xc = jnp.clip(xi, 0, w - 1)
        yc = jnp.clip(yi, 0, h - 1)
        vals = src[:, yc, xc, :].astype(jnp.float32)
        return vals * inside[None, :, :, None]

    v00 = sample(y0i, x0i)
    v01 = sample(y0i, x0i + 1)
    v10 = sample(y0i + 1, x0i)
    v11 = sample(y0i + 1, x0i + 1)
    out = ((1 - fy) * ((1 - fx) * v00 + fx * v01)
           + fy * ((1 - fx) * v10 + fx * v11))
    if jnp.issubdtype(dtype, jnp.integer):
        maxv = float(jnp.iinfo(dtype).max)
        out = jnp.clip(jnp.round(out), 0.0, maxv).astype(dtype)
    else:
        out = out.astype(dtype)
    return out.reshape(n, out_h, out_w * channels)


def rotate_batch(planes: Sequence[jnp.ndarray], fmt: PixelFormat,
                 src_w: int, src_h: int, dst_w: int, dst_h: int,
                 angle: float, shift_x: float = 0.0,
                 shift_y: float = 0.0) -> Tuple[jnp.ndarray, ...]:
    """Rotate batched storage-layout planes. Shifts are scaled per plane for
    chroma-subsampled formats (as the reference's per-plane NPP calls do)."""
    fmt = PixelFormat(fmt)
    if fmt not in SUPPORTED_FORMATS:
        raise ValueError(f"Rotate does not support {fmt.name}")
    concrete = all(isinstance(v, (int, float)) for v in
                   (angle, shift_x, shift_y))
    if concrete:
        angle, shift_x, shift_y = normalize_right_angle(
            angle, shift_x, shift_y, src_w, src_h)

    if fmt in (PixelFormat.RGB, PixelFormat.BGR, PixelFormat.RGB_32F):
        return (rotate_plane(planes[0], angle, shift_x, shift_y,
                             dst_h, dst_w, channels=3),)
    if fmt in (PixelFormat.RGB_PLANAR, PixelFormat.RGB_32F_PLANAR):
        n, h3, w = planes[0].shape
        chans = planes[0].reshape(n * 3, h3 // 3, w)
        out = rotate_plane(chans, angle, shift_x, shift_y, dst_h, dst_w)
        return (out.reshape(n, 3 * dst_h, dst_w),)

    out_planes = []
    for plane in planes:
        ph, pw = plane.shape[1], plane.shape[2]
        rx, ry = pw / src_w, ph / src_h
        # per-plane normalized right angles need re-derived shifts
        a2, sx2, sy2 = angle, shift_x * rx, shift_y * ry
        oh = int(round(dst_h * ph / src_h))
        ow = int(round(dst_w * pw / src_w))
        if concrete and _is_canonical_right_angle(angle, shift_x, shift_y,
                                                  src_w, src_h):
            k = int(angle) // 90
            rot_shape = (pw, ph) if k % 2 else (ph, pw)
            if rot_shape != (oh, ow):
                # Anisotropic subsampling (YUV422 chroma at 90/270): the
                # subsampling axis does not rotate with the content, so
                # rotate full-resolution chroma and re-subsample the new
                # horizontal axis (2-tap mean, the 4:2:2 siting average).
                full = jnp.repeat(plane, 2, axis=2)
                a3, sx3, sy3 = normalize_right_angle(
                    angle, 0.0, 0.0, pw * 2, ph)
                rot = rotate_plane(full, a3, sx3, sy3, oh, ow * 2)
                pair = (rot[:, :, 0::2].astype(jnp.float32)
                        + rot[:, :, 1::2].astype(jnp.float32)) * 0.5
                if jnp.issubdtype(plane.dtype, jnp.integer):
                    maxv = float(jnp.iinfo(plane.dtype).max)
                    pair = jnp.clip(jnp.round(pair), 0.0, maxv)
                out_planes.append(pair.astype(plane.dtype))
                continue
            a2, sx2, sy2 = normalize_right_angle(angle, 0.0, 0.0, pw, ph)
        out_planes.append(rotate_plane(plane, a2, sx2, sy2, oh, ow))
    return tuple(out_planes)
