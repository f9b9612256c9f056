"""Batched full-reference quality metrics on the TPU.

The reference measures quality host-side, one frame at a time, as a test
utility only (measure_psnr, reference tests/test_common.py:81-88 — numpy
over a single pair). Production transcode/preprocess validation wants
the same numbers at pipeline rate, so this module provides batched MSE /
PSNR / SSIM as pure jitted device ops over [N, H, W] or [N, H, W, C]
arrays — one number per batch element, computed where the frames already
live (HBM) instead of hauling them back to the host.

TPU mapping: everything is elementwise + reductions except the SSIM
local means, which run as two 1-D sliding-window sums (reduce_window)
on the VPU — f32 throughout, so scores match the numpy reference
implementation in tests to ~1e-5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mse_batch", "psnr_batch", "ssim_batch"]


def _to_f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32)


def _flat_axes(x: jnp.ndarray):
    return tuple(range(1, x.ndim))


@jax.jit
def mse_batch(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-item mean squared error: [N, ...] x2 -> [N] float32."""
    d = _to_f32(a) - _to_f32(b)
    return jnp.mean(d * d, axis=_flat_axes(d))


@functools.partial(jax.jit, static_argnames=("peak",))
def psnr_batch(a: jnp.ndarray, b: jnp.ndarray,
               peak: float = 255.0) -> jnp.ndarray:
    """Per-item PSNR in dB: [N, ...] x2 -> [N] float32.

    Identical definition to the reference's test utility
    (tests/test_common.py:81-88: 20*log10(peak) - 10*log10(mse)), but
    batched and on-device; identical frames score +inf like numpy's
    log10(0) path would after the reference's epsilon-free division.
    """
    mse = mse_batch(a, b)
    return jnp.where(
        mse == 0.0, jnp.inf,
        20.0 * np.log10(peak) - 10.0 * jnp.log10(mse))


def _local_mean(img: jnp.ndarray, win: int) -> jnp.ndarray:
    """Separable valid-mode window mean over the trailing [H, W] axes.

    Two 1-D reduce_window sum passes — the window operator is 99%+
    zeros as a dense matrix at frame sizes, so matmul form wastes
    O(H) FLOPs and bakes multi-MB [H-win+1, H] constants into every
    compiled shape; the sliding sums do exactly the win adds per
    output the operator needs, on the VPU, with no constants.
    """
    s = jax.lax.reduce_window(img, 0.0, jax.lax.add,
                              window_dimensions=(1, win, 1),
                              window_strides=(1, 1, 1), padding="VALID")
    s = jax.lax.reduce_window(s, 0.0, jax.lax.add,
                              window_dimensions=(1, 1, win),
                              window_strides=(1, 1, 1), padding="VALID")
    return s / float(win * win)


@functools.partial(jax.jit, static_argnames=("peak", "win"))
def ssim_batch(a: jnp.ndarray, b: jnp.ndarray, peak: float = 255.0,
               win: int = 8) -> jnp.ndarray:
    """Per-item mean SSIM: [N, H, W] or [N, H, W, C] x2 -> [N] float32.

    Uniform ``win``x``win`` window (valid mode), K1=0.01 / K2=0.03 —
    the standard Wang et al. constants. Channels average like scikit's
    channel_axis handling. The window means/variances run as separable
    sliding-window sums; everything else is elementwise on the VPU.
    """
    a = _to_f32(a)
    b = _to_f32(b)
    if a.ndim == 4:  # fold channels into the batch, average back at the end
        n, h, w, c = a.shape
        a2 = jnp.moveaxis(a, -1, 1).reshape(n * c, h, w)
        b2 = jnp.moveaxis(b, -1, 1).reshape(n * c, h, w)
        per = ssim_batch(a2, b2, peak=peak, win=win)
        return jnp.mean(per.reshape(n, c), axis=1)
    _, h, w = a.shape
    if h < win or w < win:
        raise ValueError(f"frames {h}x{w} smaller than SSIM window {win}")
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    mu_a = _local_mean(a, win)
    mu_b = _local_mean(b, win)
    # unbiased (n-1) window moments, matching skimage's default
    np_ = win * win
    norm = np_ / (np_ - 1.0)
    e_aa = _local_mean(a * a, win)
    e_bb = _local_mean(b * b, win)
    e_ab = _local_mean(a * b, win)
    var_a = (e_aa - mu_a * mu_a) * norm
    var_b = (e_bb - mu_b * mu_b) * norm
    cov = (e_ab - mu_a * mu_b) * norm
    s = (((2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2))
         / ((mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)))
    return jnp.mean(s, axis=_flat_axes(s))
