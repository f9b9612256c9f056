"""Scratch: XLA layout experiments for the unfused NV12->RGB convert.

The production impl materializes [N,H,W,3] (minor dim 3 = 3/128 lane
occupancy on TPU). Variants keep W minor throughout.
"""
import numpy as np
import jax
import jax.numpy as jnp

from vali_tpu.core.enums import ColorRange, ColorSpace, PixelFormat
from vali_tpu.core.details import ColorspaceConversionContext
from vali_tpu.ops import colors, csc
from bench_configs import _slope_time

B, H, W = 64, 1080, 1920
rng = np.random.default_rng(0)
NV12 = jnp.asarray(rng.integers(0, 256, (B, H * 3 // 2, W), dtype=np.uint8))
CC = ColorspaceConversionContext(ColorSpace.BT_709, ColorRange.MPEG)


def chroma_u16_upsample(plane, h):
    """Interleaved UV rows -> full-res U, V [N,H,W] via u16 bitcasts:
    deinterleave = (and, shr) at full lane occupancy; W-duplication =
    (or, shl) + bitcast back. No strided lane slices, no jnp.repeat on
    the lane axis."""
    uv = plane[:, h:, :]                                  # [N, H/2, W] u8
    uv16 = jax.lax.bitcast_convert_type(
        uv.reshape(uv.shape[0], uv.shape[1], W // 2, 2), jnp.uint16)
    u = (uv16 & jnp.uint16(0xFF)).astype(jnp.uint16)      # [N,H/2,W/2]
    v = (uv16 >> jnp.uint16(8)).astype(jnp.uint16)
    # duplicate horizontally: U|U<<8 bitcast back to u8 pairs
    du = (u | (u << jnp.uint16(8)))
    dv = (v | (v << jnp.uint16(8)))
    u8d = jax.lax.bitcast_convert_type(du, jnp.uint8).reshape(
        uv.shape[0], uv.shape[1], W)
    v8d = jax.lax.bitcast_convert_type(dv, jnp.uint8).reshape(
        uv.shape[0], uv.shape[1], W)
    u_full = jnp.repeat(u8d, 2, axis=1)                   # sublane repeat
    v_full = jnp.repeat(v8d, 2, axis=1)
    return u_full, v_full


def rgb_channels(x):
    """NV12 -> r, g, b float32 [N,H,W] with the lane-friendly chroma."""
    y = x[:, :H, :]
    u, v = chroma_u16_upsample(x, H)
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    yf = y.astype(jnp.float32) - y_off
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    r = m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf
    g = m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf
    b = m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf
    q = lambda c: jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)
    return q(r), q(g), q(b)


def v_planar(x):
    """-> RGB_PLANAR storage [N, 3H, W] via concat on the sublane axis."""
    r, g, b = rgb_channels(x)
    return jnp.concatenate([r, g, b], axis=1)


def v_packed_transpose(x):
    """-> packed RGB [N, H, W*3]: compute at full lanes, one minor-dims
    transpose [3,W]->[W,3] at the end."""
    r, g, b = rgb_channels(x)
    rgb3 = jnp.stack([r, g, b], axis=2)      # [N, H, 3, W] (W minor)
    packed = jnp.swapaxes(rgb3, 2, 3)        # [N, H, W, 3] one relayout
    return packed.reshape(x.shape[0], H, W * 3)


def v_current_packed(x):
    return csc.convert_batch((x,), PixelFormat.NV12, PixelFormat.RGB,
                             W, H, CC)[0]


def v_current_planar(x):
    return csc.convert_batch((x,), PixelFormat.NV12, PixelFormat.RGB_PLANAR,
                             W, H, CC)[0]


def main():
    import sys
    names = sys.argv[1:] or ["cur_packed", "cur_planar", "planar",
                             "packedT"]
    fns = {"cur_packed": v_current_packed, "cur_planar": v_current_planar,
           "planar": v_planar, "packedT": v_packed_transpose}
    # correctness vs production first
    ref_pk = np.asarray(jax.jit(v_current_packed)(NV12[:2]))
    n2 = ref_pk.shape[0]
    ref_pl = ref_pk.reshape(n2, H, W, 3)
    ref_pl = np.moveaxis(ref_pl, -1, 1).reshape(n2, 3 * H, W)
    for n in names:
        f = fns[n]
        out = np.asarray(jax.jit(f)(NV12[:2]))
        if n in ("planar", "cur_planar"):
            d = np.abs(out.astype(int) - ref_pl.astype(int)).max()
        else:
            d = np.abs(out.astype(int) - ref_pk.astype(int)).max()
        ms = _slope_time(f, NV12) * 1000
        print(f"{n:12s}: {ms:7.2f} ms/batch  maxdiff={d}  "
              f"fps={B / ms * 1000:,.0f}", flush=True)




def v_luma_only(x):
    """Bisect: skip chroma entirely — is the CSC math itself the cost?"""
    y = x[:, :H, :]
    yf = y.astype(jnp.float32) * 1.164 - 18.6
    q = lambda c: jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)
    r = q(yf)
    return jnp.concatenate([r, r, r], axis=1)


def v_chroma_only(x):
    """Bisect: just the chroma deinterleave+upsample, summed into u8."""
    u, v = chroma_u16_upsample(x, H)
    return jnp.concatenate([u, v, u], axis=1)


def v_no_round(x):
    """Full CSC but truncating cast instead of round."""
    y = x[:, :H, :]
    u, v = chroma_u16_upsample(x, H)
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    yf = y.astype(jnp.float32) - y_off
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    q = lambda c: jnp.clip(c, 0.0, 255.0).astype(jnp.uint8)
    r = q(m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf)
    g = q(m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf)
    b = q(m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf)
    return jnp.concatenate([r, g, b], axis=1)


def v_bf16_math(x):
    """Full CSC in bfloat16 instead of float32."""
    y = x[:, :H, :]
    u, v = chroma_u16_upsample(x, H)
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    cvt = lambda t: t.astype(jnp.int16).astype(jnp.bfloat16)
    yf = cvt(y) - jnp.bfloat16(y_off)
    uf = cvt(u) - jnp.bfloat16(128.0)
    vf = cvt(v) - jnp.bfloat16(128.0)
    q = lambda c: jnp.clip(jnp.round(c.astype(jnp.float32)), 0.0,
                           255.0).astype(jnp.uint8)
    r = q(m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf)
    g = q(m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf)
    b = q(m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf)
    return jnp.concatenate([r, g, b], axis=1)


fns_extra = {"luma": v_luma_only, "chroma": v_chroma_only,
             "noround": v_no_round, "bf16": v_bf16_math}


def main2():
    import sys
    for n in sys.argv[2:]:
        f = fns_extra[n]
        np.asarray(jax.jit(f)(NV12[:2]))
        ms = _slope_time(f, NV12) * 1000
        print(f"{n:8s}: {ms:7.2f} ms/batch", flush=True)




def v_staged_barrier(x):
    """Materialize upsampled chroma (optimization_barrier) so XLA can't
    re-fuse the unpack into every channel's elementwise pass."""
    y = x[:, :H, :]
    u, v = chroma_u16_upsample(x, H)
    u, v = jax.lax.optimization_barrier((u, v))
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    yf = y.astype(jnp.float32) - y_off
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    q = lambda c: jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)
    r = q(m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf)
    g = q(m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf)
    b = q(m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf)
    return jnp.concatenate([r, g, b], axis=1)


def v_staged_halfres(x):
    """Barrier at HALF-res chroma (before the 4x duplication): stage only
    [N,540,960] planes, let the cheap duplication fuse into the CSC."""
    uv = x[:, H:, :]
    uv16 = jax.lax.bitcast_convert_type(
        uv.reshape(uv.shape[0], uv.shape[1], W // 2, 2), jnp.uint16)
    u = (uv16 & jnp.uint16(0xFF)).astype(jnp.uint8)
    v = (uv16 >> jnp.uint16(8)).astype(jnp.uint8)
    u, v = jax.lax.optimization_barrier((u, v))
    # duplicate via the u16 trick then rows via repeat
    du = u.astype(jnp.uint16)
    du = (du | (du << jnp.uint16(8)))
    dv = v.astype(jnp.uint16)
    dv = (dv | (dv << jnp.uint16(8)))
    u8d = jax.lax.bitcast_convert_type(du, jnp.uint8).reshape(
        uv.shape[0], uv.shape[1], W)
    v8d = jax.lax.bitcast_convert_type(dv, jnp.uint8).reshape(
        uv.shape[0], uv.shape[1], W)
    uf2 = jnp.repeat(u8d, 2, axis=1)
    vf2 = jnp.repeat(v8d, 2, axis=1)
    y = x[:, :H, :]
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    yf = y.astype(jnp.float32) - y_off
    uf = uf2.astype(jnp.float32) - 128.0
    vf = vf2.astype(jnp.float32) - 128.0
    q = lambda c: jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)
    r = q(m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf)
    g = q(m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf)
    b = q(m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf)
    return jnp.concatenate([r, g, b], axis=1)


fns_extra["staged"] = v_staged_barrier
fns_extra["staged_half"] = v_staged_halfres




def v_staged_slice(x):
    """Barrier + the production-style strided slice/repeat chroma (no
    u16 bitcast trick): is the barrier alone the fix?"""
    y, u, v = csc.nv12_split(x, H)
    u = csc.upsample2x_nearest(u)
    v = csc.upsample2x_nearest(v)
    u, v = jax.lax.optimization_barrier((u, v))
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    yf = y.astype(jnp.float32) - y_off
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    q = lambda c: jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)
    r = q(m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf)
    g = q(m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf)
    b = q(m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf)
    return jnp.concatenate([r, g, b], axis=1)


def v_staged_packed(x):
    """staged chroma + packed output via one [3,W]->[W,3] relayout."""
    y = x[:, :H, :]
    u, v = chroma_u16_upsample(x, H)
    u, v = jax.lax.optimization_barrier((u, v))
    m, y_off = colors.yuv2rgb_matrix(ColorSpace.BT_709, ColorRange.MPEG)
    m = m.astype(np.float32)
    yf = y.astype(jnp.float32) - y_off
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    q = lambda c: jnp.clip(jnp.round(c), 0.0, 255.0).astype(jnp.uint8)
    r = q(m[0, 0] * yf + m[0, 1] * uf + m[0, 2] * vf)
    g = q(m[1, 0] * yf + m[1, 1] * uf + m[1, 2] * vf)
    b = q(m[2, 0] * yf + m[2, 1] * uf + m[2, 2] * vf)
    rgb3 = jnp.stack([r, g, b], axis=2)
    return jnp.swapaxes(rgb3, 2, 3).reshape(x.shape[0], H, W * 3)


fns_extra["staged_slice"] = v_staged_slice
fns_extra["staged_packed"] = v_staged_packed


if __name__ == "__main__":
    import sys
    if sys.argv[1:2] == ["bisect"]:
        main2()
    else:
        main()
