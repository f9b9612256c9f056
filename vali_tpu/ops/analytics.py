"""Batched on-device video analytics: histograms, luma statistics,
scene-change scores.

The reference has no analytics stage — users haul frames back to the
host and run numpy/OpenCV per frame. In a TPU pipeline the frames are
already batched in HBM, so shot detection and exposure statistics are
practically free next to the decode cost: everything here is pure
jitted elementwise + reduction code over ``[N, H, W]`` (or
``[N, H, W, C]``) batches, one result row per frame.

TPU mapping notes: the histogram is a scatter-add over a [bins] lattice
(XLA lowers the add-scatter natively; for the fixed-256-bin uint8 case
that is one pass over the data). Scene-change scoring combines the two
classic cheap signals — mean absolute pixel difference (SAD) and
histogram L1 distance — both pure reductions that fuse into one HBM
pass per pair of frames.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "histogram_batch",
    "luma_stats_batch",
    "frame_diff_scores",
    "hist_delta_scores",
    "scene_change_scores",
    "detect_scene_changes",
]


def _flat_axes(x: jnp.ndarray) -> Tuple[int, ...]:
    return tuple(range(1, x.ndim))


@functools.partial(jax.jit, static_argnames=("bins", "value_range"))
def histogram_batch(frames: jnp.ndarray, bins: int = 256,
                    value_range: Optional[Tuple[float, float]] = None
                    ) -> jnp.ndarray:
    """Per-frame histogram: [N, ...] -> [N, bins] int32.

    ``value_range`` is a half-open ``(lo, hi)`` interval split into
    ``bins`` equal cells, numpy.histogram-style except the last cell is
    also half-open (values == hi land in the last bin, values outside
    the range are clamped into the edge bins — the right behavior for
    exposure analysis, where clipped pixels should count as clipped).
    Defaults to ``(0, 256)`` for uint8 inputs and ``(min, max)`` is NOT
    inferred otherwise — pass it explicitly for float data.
    """
    if value_range is None:
        if frames.dtype == jnp.uint8:
            value_range = (0.0, 256.0)
        elif frames.dtype == jnp.uint16:
            value_range = (0.0, 65536.0)
        else:
            raise ValueError(
                "value_range is required for non-uint8/uint16 inputs")
    lo, hi = float(value_range[0]), float(value_range[1])
    if not hi > lo:
        raise ValueError(f"empty value_range {value_range}")
    n = frames.shape[0]
    x = frames.reshape(n, -1).astype(jnp.float32)
    idx = jnp.clip(((x - lo) * (bins / (hi - lo))).astype(jnp.int32),
                   0, bins - 1)
    out = jnp.zeros((n, bins), dtype=jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    return out.at[rows, idx].add(1)


@jax.jit
def luma_stats_batch(frames: jnp.ndarray) -> dict:
    """Per-frame exposure statistics: [N, ...] -> dict of [N] float32.

    Returns ``{"mean", "std", "min", "max"}`` — the numbers a transcode
    QC stage wants (black-frame / flash detection, exposure drift).
    ``std`` is the population standard deviation.
    """
    x = frames.astype(jnp.float32)
    axes = _flat_axes(x)
    # Two-pass moments: E[(x-mean)^2], NOT E[x^2]-mean^2 — the one-pass
    # form cancels catastrophically in f32 for high-mean low-variance
    # frames (a flat uint16 frame of 60000 reported std≈139 instead of
    # 0), and flat/near-flat frames are exactly what the QC use cases
    # below (black-frame / flash detection) need to measure.
    mean = jnp.mean(x, axis=axes)
    centered = x - mean.reshape(mean.shape + (1,) * (x.ndim - 1))
    var = jnp.mean(centered * centered, axis=axes)
    return {
        "mean": mean,
        "std": jnp.sqrt(jnp.maximum(var, 0.0)),
        "min": jnp.min(x, axis=axes).astype(jnp.float32),
        "max": jnp.max(x, axis=axes).astype(jnp.float32),
    }


def _default_peak(dtype) -> float:
    """Signal peak by dtype: 255 (uint8), 65535 (uint16), 1.0 (float —
    code values). Keeps the 10/12/16-bit and float paths from silently
    inheriting the 8-bit normalization."""
    if dtype == jnp.uint8:
        return 255.0
    if dtype == jnp.uint16:
        return 65535.0
    return 1.0


def _default_hist_range(dtype, peak: Optional[float]
                        ) -> Tuple[float, float]:
    if peak is not None:
        # Integer codes get +1-code headroom (hi = peak+1) so every code
        # value spans an equal bin width under the half-open range —
        # e.g. 10-bit peak=1023 -> (0, 1024), matching the uint8
        # peak=255 -> (0, 256) convention; hi=peak exactly would make
        # the top bin one code wider and bit-depth scores inconsistent.
        if dtype in (jnp.uint8, jnp.uint16):
            return (0.0, float(peak) + 1.0)
        return (0.0, float(peak))
    if dtype == jnp.uint8:
        return (0.0, 256.0)
    if dtype == jnp.uint16:
        return (0.0, 65536.0)
    return (0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("peak",))
def frame_diff_scores(frames: jnp.ndarray,
                      peak: Optional[float] = None) -> jnp.ndarray:
    """Mean absolute difference between consecutive frames, normalized
    to [0, 1]: [N, ...] -> [N-1] float32 (row i scores the i -> i+1
    transition). The classic SAD shot-boundary signal. ``peak`` defaults
    by dtype (255 / 65535 / 1.0 for float code values); pass it
    explicitly for e.g. LSB-aligned 10-bit uint16 (1023)."""
    if peak is None:
        peak = _default_peak(frames.dtype)
    x = frames.astype(jnp.float32)
    d = jnp.abs(x[1:] - x[:-1])
    return jnp.mean(d, axis=_flat_axes(d)) / peak


@functools.partial(jax.jit, static_argnames=("bins", "value_range"))
def hist_delta_scores(frames: jnp.ndarray, bins: int = 64,
                      value_range: Optional[Tuple[float, float]] = None
                      ) -> jnp.ndarray:
    """Normalized histogram L1 distance between consecutive frames:
    [N, ...] -> [N-1] float32 in [0, 1].

    Robust to motion (a pan keeps the histogram, a cut replaces it),
    which is why production shot detectors pair it with SAD."""
    h = histogram_batch(frames, bins=bins, value_range=value_range)
    h = h.astype(jnp.float32)
    h = h / jnp.sum(h, axis=1, keepdims=True)
    return 0.5 * jnp.sum(jnp.abs(h[1:] - h[:-1]), axis=1)


@functools.partial(jax.jit, static_argnames=("bins", "peak", "hist_weight"))
def scene_change_scores(frames: jnp.ndarray, bins: int = 64,
                        peak: Optional[float] = None,
                        hist_weight: float = 0.5) -> jnp.ndarray:
    """Blended shot-boundary score per transition: [N, ...] -> [N-1]
    float32 in [0, 1]. ``hist_weight`` balances histogram distance
    (motion-robust) against SAD (sensitive, catches fades). ``peak``
    defaults by dtype (255 / 65535 / 1.0); for LSB-aligned 10/12-bit
    uint16 pass the true peak (1023 / 4095) so both the SAD
    normalization and the histogram range match the signal."""
    sad = frame_diff_scores(frames, peak=peak)
    vrange = _default_hist_range(frames.dtype, peak)
    hd = hist_delta_scores(frames, bins=bins, value_range=vrange)
    return hist_weight * hd + (1.0 - hist_weight) * sad


def detect_scene_changes(frames, threshold: float = 0.3,
                         min_gap: int = 1, bins: int = 64,
                         peak: Optional[float] = None,
                         hist_weight: float = 0.5) -> np.ndarray:
    """Host-side convenience: indices i where frame i starts a new shot.

    Scores every i-1 -> i transition on device, then applies the
    threshold + a minimum gap (suppresses double triggers across a
    multi-frame dissolve) on the host. Returns an int64 numpy array of
    frame indices (each >= 1)."""
    scores = np.asarray(scene_change_scores(
        jnp.asarray(frames), bins=bins, peak=peak,
        hist_weight=hist_weight))
    cuts = []
    last = -(10 ** 9)
    for i, s in enumerate(scores, start=1):
        if s >= threshold and i - last >= min_gap:
            cuts.append(i)
            last = i
    return np.asarray(cuts, dtype=np.int64)
