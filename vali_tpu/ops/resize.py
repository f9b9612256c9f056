"""Batched separable resize as MXU matmuls.

TPU-native redesign of the reference's NPP Lanczos resize
(reference src/TC/src/TaskResizeSurface.cpp:34-309, NPPI_INTER_LANCZOS):
separable resampling is expressed as two dense weight-matrix matmuls

    out[o, p] = sum_h W_h[o, h] * sum_w img[h, w] * W_w[p, w]

which XLA tiles straight onto the 128x128 MXU — the idiomatic TPU shape for
a filter-based resize (gather-free, batched, fusable with the color math in
``ops.ud``). Weight matrices are built on host once per (in, out, filter)
and cached; they implement Lanczos-3 / bilinear / nearest with PIL-style
filter-scaling for anti-aliased downscaling.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import PixelFormat

#: NPP-parity Lanczos-3: corner-aligned phase, no filter scaling — matches
#: nppiResize NPPI_INTER_LANCZOS bit-closely (PSNR ~70 on the reference
#: goldens).
LANCZOS = "lanczos"
BILINEAR = "bilinear"
NEAREST = "nearest"
#: Anti-aliased, pixel-center variants (PIL-style) — higher quality for
#: large downscales; use in ML preprocessing pipelines.
LANCZOS_AA = "lanczos_aa"
BILINEAR_AA = "bilinear_aa"

#: Formats PySurfaceResizer accepts (parity: TaskResizeSurface.cpp:293-309).
SUPPORTED_FORMATS = (
    PixelFormat.RGB,
    PixelFormat.BGR,
    PixelFormat.YUV420,
    PixelFormat.YUV444,
    PixelFormat.RGB_PLANAR,
    PixelFormat.RGB_32F,
    PixelFormat.RGB_32F_PLANAR,
    PixelFormat.NV12,
    # beyond reference (its ResizeSurface ctor throws for these): the
    # 10/12-bit semi-planar formats and single-plane grayscale resize
    # fine on the same paths
    PixelFormat.P10,
    PixelFormat.P12,
    PixelFormat.Y,
    PixelFormat.GRAY12,
    PixelFormat.YUV422,
)


def method_conventions(method: str):
    """(kern, support, phase, antialias) for a resize-method string,
    mirroring resize_weights' normalization — so chroma/banded weight
    builders resample with exactly the same kernel, phase and antialias
    as the luma path. kern is None for NEAREST."""
    antialias, phase = None, None
    m = method
    if m == LANCZOS_AA:
        m, antialias, phase = LANCZOS, True, "center"
    elif m == BILINEAR_AA:
        m, antialias, phase = BILINEAR, True, "center"
    if antialias is None:
        antialias = False
    phase = phase or "corner"
    if m == LANCZOS:
        kern, support = (lambda x: _lanczos(x, 3.0)), 3.0
    elif m == BILINEAR:
        kern, support = _bilinear, 1.0
    elif m == NEAREST:
        kern, support = None, 0.5
    else:
        raise ValueError(f"Unknown resize method {method!r}")
    return kern, support, phase, antialias


def phase_positions(n_out: int, scale: float, phase: str) -> np.ndarray:
    """Destination sample positions in source coordinates for a phase."""
    if phase == "corner":
        return np.arange(n_out) * scale
    if phase == "tex":
        return np.arange(n_out) * scale - 0.5
    return (np.arange(n_out) + 0.5) * scale - 0.5


def _lanczos(x: np.ndarray, a: float) -> np.ndarray:
    x = np.abs(x)
    out = np.sinc(x) * np.sinc(x / a)
    return np.where(x < a, out, 0.0)


def _bilinear(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(0.0, 1.0 - x)


@functools.lru_cache(maxsize=256)
def resize_weights(n_in: int, n_out: int, method: str = LANCZOS,
                   antialias: Optional[bool] = None,
                   phase: Optional[str] = None) -> np.ndarray:
    """Dense [n_out, n_in] resampling matrix, rows normalized to 1.

    phase:
      - "corner": src = i*scale — NPP nppiResize convention (validated
        against the reference goldens: Lanczos-3 + corner + no antialias
        reproduces NPPI_INTER_LANCZOS at PSNR ~70).
      - "center": src = (i+0.5)*scale - 0.5 — PIL/OpenCV convention.
      - "tex":    src = i*scale - 0.5 — the UD CUDA kernel's tex2D
        convention (ResizeUtils.cu:36-37).
    """
    if method == LANCZOS_AA:
        method = LANCZOS
        antialias = True if antialias is None else antialias
        phase = phase or "center"
    elif method == BILINEAR_AA:
        method = BILINEAR
        antialias = True if antialias is None else antialias
        phase = phase or "center"
    if antialias is None:
        antialias = False
    phase = phase or "corner"

    if n_in == n_out and phase != "tex":
        return np.eye(n_out, dtype=np.float32)
    scale = n_in / n_out
    if method == NEAREST:
        idx = np.minimum((np.arange(n_out) + 0.5) * scale, n_in - 1)
        w = np.zeros((n_out, n_in), dtype=np.float32)
        w[np.arange(n_out), idx.astype(np.int64)] = 1.0
        return w
    if method == LANCZOS:
        support, kern = 3.0, lambda x: _lanczos(x, 3.0)
    elif method == BILINEAR:
        support, kern = 1.0, _bilinear
    else:
        raise ValueError(f"Unknown resize method {method!r}")
    fscale = max(1.0, scale) if antialias else 1.0
    if phase == "tex":
        centers = np.arange(n_out) * scale - 0.5
    elif phase == "corner":
        centers = np.arange(n_out) * scale
    else:
        centers = (np.arange(n_out) + 0.5) * scale - 0.5  # src coords
    radius = support * fscale
    # Evaluate the kernel on the full [n_out, n_in] grid; the support window
    # zeroes everything else. n_in <= a few thousand, so this stays small.
    src_pos = np.arange(n_in)[None, :]
    dist = (src_pos - centers[:, None]) / fscale
    w = kern(dist)
    # Edge handling: NPP clamps to the border; fold out-of-range taps into
    # the nearest edge pixel by renormalizing rows (equivalent for a
    # partition-of-unity kernel evaluated with clamped taps).
    row_sum = w.sum(axis=1, keepdims=True)
    w = w / np.where(row_sum == 0.0, 1.0, row_sum)
    return w.astype(np.float32)


def _apply_separable(img: jnp.ndarray, wh: np.ndarray,
                     ww: np.ndarray) -> jnp.ndarray:
    """img [N, H, W] or [N, H, W, C] float32 -> resized float32."""
    wh = jnp.asarray(wh)
    ww = jnp.asarray(ww)
    if img.ndim == 3:
        tmp = jnp.einsum("oh,nhw->now", wh, img,
                         preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        return jnp.einsum("now,pw->nop", tmp, ww,
                          preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    tmp = jnp.einsum("oh,nhwc->nowc", wh, img,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("nowc,pw->nopc", tmp, ww,
                      preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)


def resize_plane(plane: jnp.ndarray, out_h: int, out_w: int,
                 method: str = LANCZOS, channels: int = 1) -> jnp.ndarray:
    """Resize one batched plane [N, H, W(*channels)] preserving dtype.

    ``channels > 1`` treats the minor dim as packed interleaved channels.
    """
    dtype = plane.dtype
    n, h, wc = plane.shape
    w = wc // channels
    img = plane.astype(jnp.float32)
    if channels > 1:
        img = img.reshape(n, h, w, channels)
    out = _apply_separable(img, resize_weights(h, out_h, method),
                           resize_weights(w, out_w, method))
    if channels > 1:
        out = out.reshape(n, out_h, out_w * channels)
    if jnp.issubdtype(dtype, jnp.integer):
        maxv = float(jnp.iinfo(dtype).max)
        out = jnp.clip(jnp.round(out), 0.0, maxv).astype(dtype)
    else:
        out = out.astype(dtype)
    return out


def _pallas_resize_usable() -> bool:
    from ..utils.device import pallas_platform_available

    return pallas_platform_available()


def resize_batch(planes: Sequence[jnp.ndarray], fmt: PixelFormat,
                 src_w: int, src_h: int, dst_w: int, dst_h: int,
                 method: str = LANCZOS,
                 use_pallas: Optional[bool] = None) -> Tuple[jnp.ndarray, ...]:
    """Resize batched storage-layout planes of ``fmt`` to dst size.

    On TPU the packed 3-channel formats (RGB/BGR/RGB_32F) route to the
    banded Pallas packed resize (stride-3 expanded lane weights — none
    of the [.,.,3]-minor intermediates that run XLA at 3/128 lane
    occupancy; ~3x at 1080p->224). uint8 computes in bfloat16 (within
    1 LSB of the float32 einsum path); float32 stays float32 (within
    float32 rounding of the einsum path — banded-window accumulation
    order differs, so last-ulp deviations are possible).
    ``use_pallas=False`` forces the XLA einsum path.
    """
    fmt = PixelFormat(fmt)
    if fmt in (PixelFormat.RGB, PixelFormat.BGR, PixelFormat.RGB_32F):
        if use_pallas is None:
            use_pallas = _pallas_resize_usable()
        if use_pallas:
            from .pallas_fused import pallas_packed_resize

            return (pallas_packed_resize(
                planes[0], src_w=src_w, src_h=src_h, dst_w=dst_w,
                dst_h=dst_h, channels=3, method=method),)
        return (resize_plane(planes[0], dst_h, dst_w, method, channels=3),)
    if fmt in (PixelFormat.RGB_PLANAR, PixelFormat.RGB_32F_PLANAR):
        n, h3, w = planes[0].shape
        chans = planes[0].reshape(n * 3, h3 // 3, w)
        out = resize_plane(chans, dst_h, dst_w, method)
        return (out.reshape(n, 3 * dst_h, dst_w),)
    if fmt in (PixelFormat.NV12, PixelFormat.P10, PixelFormat.P12):
        from .csc import nv12_merge, nv12_split

        y, u, v = nv12_split(planes[0], src_h)
        # Reference resizes NV12 via YUV420 plane-wise Lanczos
        # (TaskResizeSurface.cpp:132-188); here each plane is one matmul
        # pair — no intermediate format round trip needed.
        y2 = resize_plane(y, dst_h, dst_w, method)
        u2 = resize_plane(u, dst_h // 2, dst_w // 2, method)
        v2 = resize_plane(v, dst_h // 2, dst_w // 2, method)
        return (nv12_merge(y2, u2, v2),)
    if fmt in (PixelFormat.YUV420, PixelFormat.YUV420_10bit):
        return (
            resize_plane(planes[0], dst_h, dst_w, method),
            resize_plane(planes[1], dst_h // 2, dst_w // 2, method),
            resize_plane(planes[2], dst_h // 2, dst_w // 2, method),
        )
    if fmt == PixelFormat.YUV422:
        return (
            resize_plane(planes[0], dst_h, dst_w, method),
            resize_plane(planes[1], dst_h, dst_w // 2, method),
            resize_plane(planes[2], dst_h, dst_w // 2, method),
        )
    if fmt in (PixelFormat.YUV444, PixelFormat.YUV444_10bit):
        return tuple(
            resize_plane(p, dst_h, dst_w, method) for p in planes)
    if fmt in (PixelFormat.Y, PixelFormat.GRAY12):
        return (resize_plane(planes[0], dst_h, dst_w, method),)
    raise ValueError(f"Resize does not support {fmt.name}")
