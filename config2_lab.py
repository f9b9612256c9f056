"""Lab: closing the composed-op (config 2) gap — NV12 -> RGB surface ->
224x224 resize as TWO user-visible stages with a materialized packed-RGB
intermediate (the way reference-ported PySurfaceConverter+PySurfaceResizer
code runs). Measured on v5e via the two-point slope method.

Run: python3 config2_lab.py [stage1|stage2|all]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from bench_configs import _slope_time
from vali_tpu.core.details import ColorspaceConversionContext
from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
from vali_tpu.ops import colors, csc, resize

B, H, W = 64, 1080, 1920
DH = DW = 224
CC = ColorspaceConversionContext(ColorSpace.BT_709, ColorRange.MPEG)
rng = np.random.default_rng(0)
NV12 = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W), dtype=np.uint8))
RGBP = jnp.asarray(rng.integers(0, 256, (B, H, W * 3), dtype=np.uint8))


def report(name, fn, arg, ref=None):
    ms = _slope_time(fn, arg) * 1000
    d = ""
    if ref is not None:
        got = np.asarray(fn(arg))
        want = np.asarray(ref(arg))
        d = f"  maxdiff={np.abs(got.astype(np.int32) - want.astype(np.int32)).max()}"
    print(f"{name:28s}: {ms:7.3f} ms/batch  fps={B / ms * 1000:,.0f}{d}",
          flush=True)
    return ms


# --- stage 1: NV12 -> packed RGB (full res) -------------------------------

def s1_current(x):
    return csc.convert_batch((x,), PixelFormat.NV12, PixelFormat.RGB,
                             W, H, CC)[0]


def _chroma_u16(x):
    uv = x[:, H:, :]
    n, hc, _ = uv.shape
    uv16 = jax.lax.bitcast_convert_type(
        uv.reshape(n, hc, W // 2, 2), jnp.uint16)
    u = (uv16 & jnp.uint16(0xFF))
    v = (uv16 >> jnp.uint16(8))
    du = (u | (u << jnp.uint16(8)))
    dv = (v | (v << jnp.uint16(8)))
    u8d = jax.lax.bitcast_convert_type(du, jnp.uint8).reshape(n, hc, W)
    v8d = jax.lax.bitcast_convert_type(dv, jnp.uint8).reshape(n, hc, W)
    return jnp.repeat(u8d, 2, axis=1), jnp.repeat(v8d, 2, axis=1)


def _csc_channels(x, u, v):
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    yf = x[:, :H, :].astype(jnp.float32) - np.float32(y_off)
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    q = lambda c: jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)
    r = q(m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf)
    g = q(m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf)
    b = q(m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf)
    return r, g, b


def s1_u16_packed(x):
    """u16-bitcast chroma + barrier + channel math + one pack relayout."""
    u, v = jax.lax.optimization_barrier(_chroma_u16(x))
    r, g, b = _csc_channels(x, u, v)
    rgb3 = jnp.stack([r, g, b], axis=2)          # [N, H, 3, W]
    return jnp.swapaxes(rgb3, 2, 3).reshape(B, H, W * 3)


def s1_planar_only(x):
    """channel planes, NO packing — isolates the pack-relayout cost."""
    u, v = jax.lax.optimization_barrier(_chroma_u16(x))
    r, g, b = _csc_channels(x, u, v)
    return jnp.concatenate([r, g, b], axis=1)


# --- stage 2: packed RGB -> 224x224 packed RGB ----------------------------

def s2_current(x):
    return resize.resize_batch((x,), PixelFormat.RGB, W, H, DW, DH,
                               method="lanczos_aa")[0]


def _expanded_w(n_in, n_out, method, channels=3):
    """[n_in*C, n_out*C] stride-C block expansion of the W weights: packed
    interleaved lanes resize as ONE dense-lane matmul."""
    ww = resize.resize_weights(n_in, n_out, method)  # [n_out, n_in]
    out = np.zeros((n_in * channels, n_out * channels), dtype=np.float32)
    for c in range(channels):
        out[c::channels, c::channels] = ww.T
    return out


def s2_packed_lanes(x):
    """H-pass on packed rows (identical math: H-pass never mixes lanes),
    W-pass via the stride-3 expanded matrix — no minor-dim-3 arrays."""
    wh = jnp.asarray(resize.resize_weights(H, DH, "lanczos_aa"))
    wexp = jnp.asarray(_expanded_w(W, DW, "lanczos_aa"))
    img = x.astype(jnp.float32)
    tmp = jnp.einsum("oh,nhl->nol", wh, img,
                     preferred_element_type=jnp.float32)
    out = jnp.einsum("nol,lp->nop", tmp, wexp,
                     preferred_element_type=jnp.float32)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


def s2_packed_lanes_bf16(x):
    wh = jnp.asarray(resize.resize_weights(H, DH, "lanczos_aa"),
                     dtype=jnp.bfloat16)
    wexp = jnp.asarray(_expanded_w(W, DW, "lanczos_aa"),
                       dtype=jnp.bfloat16)
    img = x.astype(jnp.int16).astype(jnp.bfloat16)
    tmp = jnp.einsum("oh,nhl->nol", wh, img,
                     preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    out = jnp.einsum("nol,lp->nop", tmp, wexp,
                     preferred_element_type=jnp.float32)
    return jnp.clip(jnp.round(out), 0.0, 255.0).astype(jnp.uint8)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("stage1", "all"):
        print("--- stage 1: NV12 -> packed RGB (64x1080p) ---", flush=True)
        report("s1_current", s1_current, NV12)
        report("s1_u16_packed", s1_u16_packed, NV12, ref=s1_current)
        report("s1_planar_only", s1_planar_only, NV12)
    if which in ("stage2", "all"):
        print("--- stage 2: packed RGB 1080p -> 224 ---", flush=True)
        report("s2_current", s2_current, RGBP)
        report("s2_packed_lanes", s2_packed_lanes, RGBP, ref=s2_current)
        report("s2_packed_lanes_bf16", s2_packed_lanes_bf16, RGBP,
               ref=s2_current)


if __name__ == "__main__":
    main()
