"""Batched full-reference quality metrics on the TPU.

The reference measures quality host-side, one frame at a time, as a test
utility only (measure_psnr, reference tests/test_common.py:81-88 — numpy
over a single pair). Production transcode/preprocess validation wants
the same numbers at pipeline rate, so this module provides batched MSE /
PSNR / SSIM as pure jitted device ops over [N, H, W] or [N, H, W, C]
arrays — one number per batch element, computed where the frames already
live (HBM) instead of hauling them back to the host.

TPU mapping: everything is elementwise + reductions except the SSIM
local means, which run as separable box-filter matmuls on the MXU
(precision=HIGHEST, so scores are float32-exact and match the numpy
reference implementation in tests to ~1e-5).
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


def _box_matrix(n: int, win: int) -> np.ndarray:
    """[n_out, n] valid-mode moving-average operator (uniform window)."""
    n_out = n - win + 1
    m = np.zeros((n_out, n), dtype=np.float32)
    for i in range(n_out):
        m[i, i:i + win] = 1.0 / win
    return m


def _local_mean(img: jnp.ndarray, mh: jnp.ndarray,
                mw: jnp.ndarray) -> jnp.ndarray:
    """Separable valid-mode window mean over the trailing [H, W] axes."""
    t = jnp.einsum("oh,nhw->now", mh, img,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("now,pw->nop", t, mw,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("peak", "win"))
def ssim_batch(a: jnp.ndarray, b: jnp.ndarray, peak: float = 255.0,
               win: int = 8) -> jnp.ndarray:
    """Per-item mean SSIM: [N, H, W] or [N, H, W, C] x2 -> [N] float32.

    Uniform ``win``x``win`` window (valid mode), K1=0.01 / K2=0.03 —
    the standard Wang et al. constants. Channels average like scikit's
    channel_axis handling. The window means/variances run as separable
    matmuls (MXU); everything else is elementwise on the VPU.
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
    mh = jnp.asarray(_box_matrix(h, win))
    mw = jnp.asarray(_box_matrix(w, win))
    c1 = (0.01 * peak) ** 2
    c2 = (0.03 * peak) ** 2
    mu_a = _local_mean(a, mh, mw)
    mu_b = _local_mean(b, mh, mw)
    # unbiased (n-1) window moments, matching skimage's default
    np_ = win * win
    norm = np_ / (np_ - 1.0)
    e_aa = _local_mean(a * a, mh, mw)
    e_bb = _local_mean(b * b, mh, mw)
    e_ab = _local_mean(a * b, mh, mw)
    var_a = (e_aa - mu_a * mu_a) * norm
    var_b = (e_bb - mu_b * mu_b) * norm
    cov = (e_ab - mu_a * mu_b) * norm
    s = (((2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2))
         / ((mu_a * mu_a + mu_b * mu_b + c1) * (var_a + var_b + c2)))
    return jnp.mean(s, axis=_flat_axes(s))
