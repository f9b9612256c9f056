"""Batched HDR -> SDR tone mapping on the TPU.

The reference decodes 10-bit HDR formats (P010/P012, reference
MemoryInterfaces.hpp P10/P12 rows) but leaves tone mapping to the user.
A production HDR->SDR transcode needs it, and it is pure elementwise
math — exactly what the VPU eats for free while the frames are already
in HBM — so this module provides the standard pipeline as batched
jitted ops over ``[N, H, W, 3]`` RGB batches:

  nonlinear code values (PQ / HLG, BT.2020 primaries)
    -> linear light (absolute nits)
    -> tone map luminance (BT.2390 EETF / Reinhard / Hable filmic)
    -> BT.2020 -> BT.709 gamut matrix
    -> BT.1886-style display gamma -> SDR code values

Transfer functions follow SMPTE ST 2084 (PQ) and ARIB STD-B67 / ITU-R
BT.2100 (HLG); the default operator is the ITU-R BT.2390 EETF hermite
knee — the broadcast-standard curve — applied to max(R,G,B) so hue is
preserved and no channel clips before the knee.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "pq_eotf", "pq_inv_eotf", "hlg_inv_oetf", "hlg_eotf",
    "BT2020_TO_BT709", "BT709_TO_BT2020",
    "bt2020_yuv_to_rgb", "tonemap_batch",
]

# SMPTE ST 2084 constants
_PQ_M1 = 2610.0 / 16384.0
_PQ_M2 = 2523.0 / 4096.0 * 128.0
_PQ_C1 = 3424.0 / 4096.0
_PQ_C2 = 2413.0 / 4096.0 * 32.0
_PQ_C3 = 2392.0 / 4096.0 * 32.0

# ARIB STD-B67 (HLG) constants
_HLG_A = 0.17883277
_HLG_B = 1.0 - 4.0 * _HLG_A
_HLG_C = 0.5 - _HLG_A * np.log(4.0 * _HLG_A)

#: Linear-light primaries conversion (ITU-R BT.2087 / derived from the
#: BT.2020 and BT.709 chromaticities, D65 white).
BT2020_TO_BT709 = np.array(
    [[1.660491, -0.587641, -0.072850],
     [-0.124550, 1.132900, -0.008349],
     [-0.018151, -0.100579, 1.118730]], dtype=np.float64)
BT709_TO_BT2020 = np.linalg.inv(BT2020_TO_BT709)


def pq_eotf(e: jnp.ndarray) -> jnp.ndarray:
    """ST 2084 EOTF: code value [0,1] -> display luminance in nits."""
    e = jnp.maximum(e, 0.0)
    p = jnp.power(e, 1.0 / _PQ_M2)
    num = jnp.maximum(p - _PQ_C1, 0.0)
    den = _PQ_C2 - _PQ_C3 * p
    return 10000.0 * jnp.power(num / den, 1.0 / _PQ_M1)


def pq_inv_eotf(nits: jnp.ndarray) -> jnp.ndarray:
    """ST 2084 inverse EOTF: luminance in nits -> code value [0,1]."""
    y = jnp.power(jnp.maximum(nits, 0.0) / 10000.0, _PQ_M1)
    return jnp.power((_PQ_C1 + _PQ_C2 * y) / (1.0 + _PQ_C3 * y), _PQ_M2)


def hlg_inv_oetf(e: jnp.ndarray) -> jnp.ndarray:
    """HLG inverse OETF: code value [0,1] -> scene-linear light [0,1]."""
    e = jnp.maximum(e, 0.0)
    lo = (e * e) / 3.0
    hi = (jnp.exp((e - _HLG_C) / _HLG_A) + _HLG_B) / 12.0
    return jnp.where(e <= 0.5, lo, hi)


def hlg_eotf(e: jnp.ndarray, luma: jnp.ndarray,
             peak_nits: float = 1000.0) -> jnp.ndarray:
    """HLG EOTF (BT.2100): code values + scene luminance -> display nits.

    Applies the system OOTF ``L_d = peak * Y_s^(gamma-1) * E_s`` with the
    BT.2100 reference gamma for the nominal peak
    (``1.2 + 0.42*log10(peak/1000)``). ``luma`` is the scene-linear
    luminance of the pixel (from the 2020 weights), broadcast against
    ``e``'s scene-linear value."""
    gamma = 1.2 + 0.42 * np.log10(peak_nits / 1000.0)
    scene = hlg_inv_oetf(e)
    return peak_nits * jnp.power(jnp.maximum(luma, 1e-7), gamma - 1.0) * scene


@functools.partial(jax.jit, static_argnames=("bit_depth", "full_range",
                                              "msb_aligned"))
def bt2020_yuv_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray,
                      bit_depth: int = 10,
                      full_range: bool = False,
                      msb_aligned: bool = False) -> jnp.ndarray:
    """BT.2020 (non-constant-luminance) YCbCr -> nonlinear RGB code
    values: per-plane [N, H, W] -> [N, H, W, 3] float32 in [0, 1].

    The decode-side entry point of the HDR pipeline: the parity csc
    registry carries only the BT.601/709 pairs the reference's NPP
    dispatch supports (TaskConvertSurface.cpp:62-520), so 2020-matrixed
    10/12-bit streams route here at full float precision instead of
    being squeezed through the 8-bit NV12 path. Chroma must already be
    co-sited with luma (e.g. via ``ops.csc``'s upsample or a resize of
    the U/V planes); the output stays PQ/HLG-encoded, ready for
    :func:`tonemap_batch`.

    ``msb_aligned`` describes where the code values sit in the uint16
    container: planar yuv420p10/p12 decode output (``PixelFormat.
    YUV420_10bit``) is LSB-aligned (values 0..2^depth-1, the default);
    P010/P012-layout planes (``PixelFormat.P10``/``P12``, v16 = v10<<6 —
    the NVDEC convention this build's decoder reproduces, see
    decoder.cpp yuv420p12->P012 repack) are MSB-aligned and need
    ``msb_aligned=True``.
    """
    kr, kb = 0.2627, 0.0593
    kg = 1.0 - kr - kb
    # offsets/extents in code units: LSB scales the 8-bit studio points
    # by 2^(depth-8); MSB-aligned data lives in the top bits of the
    # uint16, i.e. the 8-bit points scaled by 256 regardless of depth
    scale = 256.0 if msb_aligned else float(1 << (bit_depth - 8))
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if full_range:
        maxv = (float(((1 << bit_depth) - 1) << (16 - bit_depth))
                if msb_aligned else float((1 << bit_depth) - 1))
        yn = yf / maxv
        un = uf / maxv - 0.5
        vn = vf / maxv - 0.5
    else:
        yn = (yf - 16.0 * scale) / (219.0 * scale)
        un = (uf - 128.0 * scale) / (224.0 * scale)
        vn = (vf - 128.0 * scale) / (224.0 * scale)
    r = yn + 2.0 * (1.0 - kr) * vn
    b = yn + 2.0 * (1.0 - kb) * un
    g = (yn - (2.0 * kb * (1.0 - kb) / kg) * un
         - (2.0 * kr * (1.0 - kr) / kg) * vn)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def _bt2390_eetf(ip: jnp.ndarray, max_lum: float, max_ts: float
                 ) -> jnp.ndarray:
    """ITU-R BT.2390 EETF on normalized-PQ luminance.

    ``ip`` is the PQ-space signal divided by ``max_lum`` (source peak in
    PQ space) so it lives in [0, 1]; ``max_ts`` is the target peak in the
    same normalized space. Identity below the knee ``KS``, hermite spline
    above; monotone and continuous at the knee by construction."""
    ks = 1.5 * max_ts - 0.5
    t = (ip - ks) / (1.0 - ks)
    t2 = t * t
    t3 = t2 * t
    p = ((2.0 * t3 - 3.0 * t2 + 1.0) * ks
         + (t3 - 2.0 * t2 + t) * (1.0 - ks)
         + (-2.0 * t3 + 3.0 * t2) * max_ts)
    return jnp.where(ip < ks, ip, p)


def _np_pq_inv(nits: float) -> float:
    """Host-side ST 2084 inverse EOTF for static curve constants (keeps
    trace-time math off the device — an eager jnp call inside a jit
    trace is a device RPC through the tunnel)."""
    y = (max(nits, 0.0) / 10000.0) ** _PQ_M1
    return float(((_PQ_C1 + _PQ_C2 * y) / (1.0 + _PQ_C3 * y)) ** _PQ_M2)


def _tone_scale(lum_nits: jnp.ndarray, peak_nits: float,
                target_nits: float, method: str) -> jnp.ndarray:
    """Per-pixel gain mapping source luminance (nits) into
    [0, target_nits], returned as out_luminance / in_luminance."""
    lum = jnp.maximum(lum_nits, 1e-6)
    if target_nits >= peak_nits:
        # nothing to compress: identity up to the target clamp (also
        # keeps the BT.2390 knee KS = 1.5*maxTS - 0.5 away from its
        # ks == 1 division singularity)
        return jnp.minimum(lum, target_nits) / lum
    if method == "bt2390":
        max_lum = _np_pq_inv(peak_nits)
        max_ts = _np_pq_inv(target_nits) / max_lum
        ip = pq_inv_eotf(lum) / max_lum
        out = pq_eotf(jnp.clip(_bt2390_eetf(ip, max_lum, max_ts), 0.0, 1.0)
                      * max_lum)
    elif method == "reinhard":
        # Extended Reinhard with white point at the source peak: maps
        # peak -> target exactly, near-identity in the shadows.
        x = lum / target_nits
        w = peak_nits / target_nits
        out = target_nits * (x * (1.0 + x / (w * w)) / (1.0 + x))
    elif method == "hable":
        a, b, c, d, e, f = 0.15, 0.50, 0.10, 0.20, 0.02, 0.30

        def curve(x):
            return ((x * (a * x + c * b) + d * e)
                    / (x * (a * x + b) + d * f)) - e / f

        # exposure so mid-gray lands comparably; normalize by the curve
        # value at the source peak so peak -> target exactly
        x = lum / target_nits
        w = peak_nits / target_nits
        out = target_nits * curve(x) / float(curve(np.float64(w)))
    else:
        raise ValueError(f"unknown tone-map method '{method}'")
    return jnp.minimum(out, target_nits) / lum


@functools.partial(jax.jit, static_argnames=(
    "transfer", "peak_nits", "target_nits", "method", "out_dtype",
    "convert_gamut", "out_gamma"))
def tonemap_batch(rgb: jnp.ndarray, transfer: str = "pq",
                  peak_nits: float = 1000.0, target_nits: float = 100.0,
                  method: str = "bt2390", out_dtype=jnp.uint8,
                  convert_gamut: bool = True,
                  out_gamma: float = 2.4) -> jnp.ndarray:
    """HDR RGB batch -> SDR RGB batch: [N, H, W, 3] -> [N, H, W, 3].

    ``rgb`` holds nonlinear code values: float in [0, 1], uint16
    (full-scale, i.e. 10-bit data already shifted to the MSBs the way
    P010 stores it and ``ConvertSurface`` preserves it), or uint8.
    ``transfer`` is ``"pq"`` (ST 2084) or ``"hlg"`` (BT.2100, with the
    reference OOTF for ``peak_nits``); the input is assumed BT.2020 and
    ``convert_gamut`` emits BT.709 primaries. The tone curve scales
    max(R,G,B) — hue-preserving, no pre-knee channel clipping.
    ``out_gamma`` is the display-inverse gamma for the SDR encode
    (BT.1886 CRT-reference 2.4 by default). Output: uint8 code values,
    or float in [0, 1] for float ``out_dtype``.
    """
    if rgb.dtype == jnp.uint8:
        x = rgb.astype(jnp.float32) / 255.0
    elif rgb.dtype == jnp.uint16:
        x = rgb.astype(jnp.float32) / 65535.0
    else:
        x = rgb.astype(jnp.float32)

    # BT.2020 luminance weights for the HLG OOTF
    wr, wg, wb = 0.2627, 0.6780, 0.0593
    if transfer == "pq":
        lin = pq_eotf(x)  # nits
    elif transfer == "hlg":
        scene = hlg_inv_oetf(x)
        luma = (wr * scene[..., 0] + wg * scene[..., 1]
                + wb * scene[..., 2])[..., None]
        lin = hlg_eotf(x, luma, peak_nits=peak_nits)
    else:
        raise ValueError(f"unknown transfer '{transfer}'")

    peak = jnp.max(lin, axis=-1, keepdims=True)  # max(R,G,B) in nits
    gain = _tone_scale(peak, float(peak_nits), float(target_nits), method)
    lin = lin * gain

    if convert_gamut:
        m = jnp.asarray(BT2020_TO_BT709, dtype=jnp.float32)
        # true-f32 matmul: the MXU's bf16 default loses ~0.4% here, which
        # the 1/2.4 gamma blows up to ~20 LSB right at the gamut-clip
        # boundary (found by tests_tpu/test_wrappers_tpu.py on real TPU)
        lin = jnp.einsum("...c,dc->...d", lin, m,
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32)

    sdr = jnp.clip(lin / float(target_nits), 0.0, 1.0)
    sdr = jnp.power(sdr, 1.0 / float(out_gamma))
    odt = np.dtype(out_dtype)
    if odt.kind in "ui":
        # Scale [0,1] SDR to the full code range of ANY integer dtype —
        # a bare cast would floor everything to {0, 1} (16-bit SDR
        # output came back essentially black before this scaled path).
        # For dtypes wider than f32's 24-bit mantissa the exact max is
        # not representable in the f32 compute type (float32(2^31-1)
        # rounds UP to 2^31, making the cast of peak white overflow with
        # implementation-defined result), so scale by the largest f32
        # <= max: full scale lands within one f32 ULP of the true max
        # and the cast can never leave the dtype's range.
        peak = np.float32(np.iinfo(odt).max)
        if np.float64(peak) > np.float64(np.iinfo(odt).max):
            peak = np.nextafter(peak, np.float32(0.0))
        return jnp.round(sdr * float(peak)).astype(out_dtype)
    return sdr.astype(out_dtype)
