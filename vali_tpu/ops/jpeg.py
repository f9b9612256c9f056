"""TPU-side JPEG transform stage: color convert + subsample + 8x8 DCT +
quantization, batched over frames.

The reference encodes JPEG on the nvJPEG ASIC (TaskNvJpegEncode.cpp). The
TPU split (SURVEY.md §7 stretch goal): everything up to entropy coding runs
on the TPU as batched matmuls/elementwise — the 8x8 type-II DCT is
``D @ block @ D^T`` which XLA maps to MXU batched matmuls over all blocks
of all frames at once — and the host finishes with libjpeg's
``jpeg_write_coefficients`` (no pixel work on host at all).

Quantization tables replicate libjpeg's IJG quality scaling exactly so the
host-written headers match the device-quantized coefficients.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Annex K / IJG base tables (luminance, chrominance), natural order.
_BASE_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

_BASE_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)


def quant_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling (parity with libjpeg jpeg_set_quality /
    jpeg_quality_scaling) — must match the host writer bit-exactly."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    tables = []
    for base in (_BASE_LUMA, _BASE_CHROMA):
        t = (base * scale + 50) // 100
        tables.append(np.clip(t, 1, 255).astype(np.int32))
    return tables[0], tables[1]


@functools.lru_cache(maxsize=1)
def dct_matrix() -> np.ndarray:
    """8x8 type-II DCT matrix D with JPEG normalization:
    F = D @ f @ D^T."""
    d = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        cu = np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0)
        for x in range(8):
            d[u, x] = cu * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return d.astype(np.float32)


def _blockify(plane: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W] -> [N, H/8, W/8, 8, 8]"""
    n, h, w = plane.shape
    return plane.reshape(n, h // 8, 8, w // 8, 8).transpose(0, 1, 3, 2, 4)


def _dct_quant(plane: jnp.ndarray, qtable: np.ndarray,
               center: float = 128.0) -> jnp.ndarray:
    """[N, H, W] float -> quantized coefficients [N, H/8, W/8, 8, 8] i16."""
    blocks = _blockify(plane.astype(jnp.float32) - center)
    d = jnp.asarray(dct_matrix())
    coef = jnp.einsum("ux,nijxy,vy->nijuv", d, blocks, d,
                      preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    q = jnp.asarray(qtable.astype(np.float32))
    return jnp.clip(jnp.round(coef / q), -32768, 32767).astype(jnp.int16)


def _subsample2(c: jnp.ndarray) -> jnp.ndarray:
    """h2v2 box downsample (libjpeg default). Odd dimensions are
    edge-replicated to even first (libjpeg's h2v2_downsample does the
    same via expand_right/bottom_edge); the 2x2 mean itself is shared
    with the CSC module."""
    from .csc import subsample420

    n, h, w = c.shape
    if h % 2 or w % 2:
        c = jnp.pad(c, ((0, 0), (0, h % 2), (0, w % 2)), mode="edge")
    return subsample420(c)


def _pad_to_blocks(plane: jnp.ndarray) -> jnp.ndarray:
    """Edge-replicate to multiples of 8 (libjpeg does the same)."""
    n, h, w = plane.shape
    ph = (-h) % 8
    pw = (-w) % 8
    if ph or pw:
        plane = jnp.pad(plane, ((0, 0), (0, ph), (0, pw)), mode="edge")
    return plane


@functools.partial(jax.jit, static_argnames=("src_fmt", "width", "height",
                                             "quality", "subsample420"))
def jpeg_transform_batch(planes, *, src_fmt: int, width: int, height: int,
                         quality: int, subsample420: bool = True):
    """Batched device stage of JPEG encode.

    planes: storage-layout batched planes (RGB/BGR packed [N,H,3W],
    RGB_PLANAR [N,3H,W], Y [N,H,W], YUV444/YUV420 3-plane).
    Returns (y, cb, cr) quantized coefficient arrays
    [N, bh, bw, 8, 8] int16 (cb/cr None for grayscale).
    """
    from ..core.enums import PixelFormat

    fmt = PixelFormat(src_fmt)
    # width/height are the logical size the host writer will declare;
    # validate them against the storage planes so a mismatch errors here
    # instead of the writer's edge-block clamping silently producing
    # wrong edge content
    _, ph, pw = planes[0].shape
    expect = {
        PixelFormat.Y: (height, width),
        PixelFormat.RGB: (height, width * 3),
        PixelFormat.BGR: (height, width * 3),
        PixelFormat.RGB_PLANAR: (height * 3, width),
        PixelFormat.YUV444: (height, width),
        PixelFormat.YUV420: (height, width),
    }.get(fmt)
    if expect is not None and (ph, pw) != expect:
        raise ValueError(
            f"jpeg_transform_batch: plane shape {(ph, pw)} does not match "
            f"the declared {width}x{height} for {fmt.name} "
            f"(expected {expect})")
    ql, qc = quant_tables(quality)

    if fmt == PixelFormat.Y:
        y = planes[0].astype(jnp.float32)
        return (_dct_quant(_pad_to_blocks(y), ql), None, None)

    if fmt in (PixelFormat.RGB, PixelFormat.BGR, PixelFormat.RGB_PLANAR):
        if fmt == PixelFormat.RGB_PLANAR:
            n, h3, w = planes[0].shape
            rgb = jnp.moveaxis(planes[0].reshape(n, 3, h3 // 3, w), 1, -1)
        else:
            n, h, w3 = planes[0].shape
            rgb = planes[0].reshape(n, h, w3 // 3, 3)
        if fmt == PixelFormat.BGR:
            rgb = rgb[..., ::-1]
        rgb = rgb.astype(jnp.float32)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        # JFIF full-range BT.601 (libjpeg rgb_ycc exact coefficients)
        y = 0.29900 * r + 0.58700 * g + 0.11400 * b
        cb = -0.16874 * r - 0.33126 * g + 0.50000 * b + 128.0
        cr = 0.50000 * r - 0.41869 * g - 0.08131 * b + 128.0
    elif fmt == PixelFormat.YUV444:
        y = planes[0].astype(jnp.float32)
        cb = planes[1].astype(jnp.float32)
        cr = planes[2].astype(jnp.float32)
    elif fmt == PixelFormat.YUV420:
        if not subsample420:
            # Chroma is already half-size; emitting it under a 4:4:4
            # coefficient layout would make the writer read half-size
            # planes as full-size and corrupt the JPEG. Raise at the op,
            # not only in the engine wrapper (this is the public API).
            raise ValueError(
                "jpeg_transform_batch: subsample420=False is impossible "
                "for YUV420 input — the chroma planes are already "
                "subsampled")
        y = planes[0].astype(jnp.float32)
        cb = planes[1].astype(jnp.float32)
        cr = planes[2].astype(jnp.float32)
        return (
            _dct_quant(_pad_to_blocks(y), ql),
            _dct_quant(_pad_to_blocks(cb), qc),
            _dct_quant(_pad_to_blocks(cr), qc),
        )
    else:
        raise ValueError(f"jpeg_transform_batch: unsupported {fmt.name}")

    if subsample420:
        cb = _subsample2(cb)
        cr = _subsample2(cr)
    return (
        _dct_quant(_pad_to_blocks(y), ql),
        _dct_quant(_pad_to_blocks(cb), qc),
        _dct_quant(_pad_to_blocks(cr), qc),
    )
