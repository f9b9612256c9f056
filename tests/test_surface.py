"""Surface / SurfacePlane / CudaBuffer tests.

Ports the semantics of the reference's tests/test_PySurface.py and
tests/test_GpuMem.py onto the TPU build: Make for every format, plane
geometry, Clone independence, DLPack round trips, borrowed-memory flags.
"""

import numpy as np
import pytest

import vali_tpu as vali
from vali_tpu.core.formats import all_formats, format_info
from vali_tpu.memory.host import host_frame_to_planes, planes_to_host_frame

W, H = 64, 48


@pytest.mark.parametrize("fmt", [f for f in all_formats()])
def test_make_all_formats(fmt):
    surf = vali.Surface.Make(fmt, W, H, gpu_id=0)
    info = format_info(fmt)
    assert surf.Format == fmt
    assert surf.Width == W
    assert surf.Height == H
    assert not surf.IsEmpty
    assert surf.IsOwnMemory
    assert surf.NumPlanes == info.num_planes
    assert surf.NumComponents == info.num_components
    assert surf.HostSize == info.host_size(W, H)
    for plane, (h, w) in zip(surf.Planes, info.plane_dims(W, H)):
        assert plane.Width == w
        assert plane.Height == h
        assert plane.ElemSize == info.elem_size
        assert plane.Pitch == w * info.elem_size
        assert plane.HostFrameSize == h * w * info.elem_size


def test_shape_semantics():
    nv12 = vali.Surface.Make(vali.PixelFormat.NV12, W, H)
    assert nv12.Shape == [H * 3 // 2, W]
    rgb = vali.Surface.Make(vali.PixelFormat.RGB, W, H)
    assert rgb.Shape == [H, W, 3]
    planar = vali.Surface.Make(vali.PixelFormat.RGB_PLANAR, W, H)
    assert planar.Shape == [3, H, W]
    yuv = vali.Surface.Make(vali.PixelFormat.YUV420, W, H)
    # multi-plane formats fall back to flat element count
    assert yuv.Shape == [W * H * 3 // 2]


def test_odd_sizes_rejected():
    with pytest.raises(ValueError):
        vali.Surface.Make(vali.PixelFormat.NV12, 63, 48)
    with pytest.raises(ValueError):
        vali.Surface.Make(vali.PixelFormat.YUV422, 63, 48)
    # YUV422 subsamples only horizontally: odd height is fine
    vali.Surface.Make(vali.PixelFormat.YUV422, 64, 47)


def test_clone_is_deep():
    surf = vali.Surface.from_numpy(
        np.random.randint(0, 255, (H, W, 3), dtype=np.uint8),
        vali.PixelFormat.RGB)
    clone = surf.Clone()
    assert np.array_equal(clone.to_numpy(), surf.to_numpy())
    surf._replace_arrays([p + 1 for p in surf.plane_arrays()])
    assert not np.array_equal(clone.to_numpy(), surf.to_numpy())


def test_dlpack_roundtrip_cpu():
    import jax.numpy as jnp

    src = np.random.randint(0, 255, (H, W, 3), dtype=np.uint8)
    surf = vali.Surface.from_numpy(src, vali.PixelFormat.RGB)
    arr = jnp.from_dlpack(surf)
    assert arr.shape == (H, W, 3)
    assert np.array_equal(np.asarray(arr), src)

    back = vali.Surface.from_dlpack(arr, vali.PixelFormat.RGB)
    assert back.Width == W and back.Height == H
    assert not back.IsOwnMemory
    assert np.array_equal(back.to_numpy(), src)


def test_dlpack_multi_plane_raises():
    surf = vali.Surface.Make(vali.PixelFormat.YUV420, W, H)
    with pytest.raises(RuntimeError):
        surf.__dlpack_device__()
    with pytest.raises(RuntimeError):
        surf.to_jax()


def test_nv12_export_shape():
    surf = vali.Surface.Make(vali.PixelFormat.NV12, W, H)
    arr = surf.to_jax()
    assert arr.shape == (H * 3 // 2, W)
    back = vali.Surface.from_jax(arr, vali.PixelFormat.NV12)
    assert back.Width == W and back.Height == H


def test_planar_export_shape():
    src = np.random.randint(0, 255, (3, H, W), dtype=np.uint8)
    surf = vali.Surface.from_numpy(src, vali.PixelFormat.RGB_PLANAR)
    assert surf.Width == W and surf.Height == H
    assert np.array_equal(surf.to_numpy(), src)


def test_from_cai_dict():
    src = np.random.randint(0, 255, (H, W, 3), dtype=np.uint8)
    d = {
        "shape": src.shape,
        "typestr": "|u1",
        "data": (src.ctypes.data, False),
        "version": 3,
    }
    surf = vali.Surface.from_cai(d, vali.PixelFormat.RGB)
    assert np.array_equal(surf.to_numpy(), src)


def test_host_frame_roundtrip():
    for fmt in (vali.PixelFormat.NV12, vali.PixelFormat.YUV420,
                vali.PixelFormat.RGB, vali.PixelFormat.P10):
        info = format_info(fmt)
        nbytes = info.host_size(W, H)
        flat = np.random.randint(0, 255, nbytes, dtype=np.uint8)
        planes = host_frame_to_planes(flat, fmt, W, H)
        assert sum(p.nbytes for p in planes) == nbytes
        back = planes_to_host_frame(planes)
        assert np.array_equal(back, flat)


def test_flat_upload():
    info = format_info(vali.PixelFormat.NV12)
    flat = np.random.randint(0, 255, info.host_size(W, H), dtype=np.uint8)
    surf = vali.Surface.from_numpy(flat, vali.PixelFormat.NV12,
                                   width=W, height=H)
    assert surf.Width == W and surf.Height == H
    assert np.array_equal(surf.to_numpy().reshape(-1), flat)


def test_cuda_buffer():
    buf = vali.CudaBuffer.Make(4, 128, gpu_id=0)
    assert buf.ElemSize == 4
    assert buf.NumElems == 128
    assert buf.RawMemSize == 512
    clone = buf.Clone()
    assert clone.RawMemSize == 512
    other = vali.CudaBuffer.Make(4, 128)
    other.CopyFrom(buf)
    bad = vali.CudaBuffer.Make(2, 128)
    with pytest.raises(RuntimeError):
        bad.CopyFrom(buf)


def test_event_and_stream():
    ev = vali.CudaStreamEvent(0, 0)
    ev.Record()
    ev.Wait()


def test_allocation_registry():
    from vali_tpu.memory import registry

    registry.enable(True)
    try:
        before = len(registry.live_allocations())
        surf = vali.Surface.Make(vali.PixelFormat.Y, W, H)
        assert len(registry.live_allocations()) == before + 1
        del surf
        import gc

        gc.collect()
        assert len(registry.live_allocations()) == before
    finally:
        registry.enable(False)


def test_registry_zero_after_pipeline_teardown():
    """Leak accounting (reference TRACK_TOKEN_ALLOCATIONS parity,
    MemoryInterfaces.cpp:27-115): after a MultiStreamPipeline run and
    teardown, no Surface/CudaBuffer registrations may remain live."""
    import gc
    import os

    from vali_tpu.memory import registry

    gt = "/root/reference/tests/data/test.mp4"
    if not os.path.exists(gt):
        pytest.skip("no reference data")
    from vali_tpu.pipeline.multistream import MultiStreamPipeline

    registry.enable(True)
    try:
        gc.collect()
        before = len(registry.live_allocations())
        pipe = MultiStreamPipeline([gt, gt], dst_w=32, dst_h=32, gpu_id=0)
        batches = 0
        for batch, ids in pipe:
            batches += 1
            if batches >= 4:
                pipe.stop()
                break
        del pipe, batch, ids
        gc.collect()
        assert len(registry.live_allocations()) == before, registry.dump()
    finally:
        registry.enable(False)


def test_registry_zero_after_decode_surface_iterations():
    """1000 decode-to-surface iterations leave nothing registered."""
    import gc
    import os

    from vali_tpu.memory import registry

    gt = "/root/reference/tests/data/test.mp4"
    if not os.path.exists(gt):
        pytest.skip("no reference data")
    registry.enable(True)
    try:
        gc.collect()
        before = registry.live_bytes()
        n = 0
        while n < 1000:
            dec = vali.PyDecoder(gt, {}, gpu_id=0)
            surf = vali.Surface.Make(dec.Format, dec.Width, dec.Height,
                                     gpu_id=0)
            while n < 1000 and dec.DecodeSingleSurface(surf)[0]:
                n += 1
            del dec, surf
        gc.collect()
        assert registry.live_bytes() == before, registry.dump()
    finally:
        registry.enable(False)


def test_module_level_enum_exports():
    assert vali.NV12 == vali.PixelFormat.NV12
    assert vali.BT_709 == vali.ColorSpace.BT_709
    assert vali.MPEG == vali.ColorRange.MPEG
    assert vali.SUCCESS == vali.TaskExecInfo.SUCCESS
    assert int(vali.PixelFormat.NV12) == 3
    assert vali.GetNumGpus() >= 1
    assert vali.NO_PTS == -(2**63)


def test_seek_context():
    by_frame = vali.SeekContext(seek_frame=10)
    assert by_frame.seek_frame == 10
    by_ts = vali.SeekContext(seek_ts=1.5)
    assert by_ts.seek_tssec == 1.5
    with pytest.raises(ValueError):
        vali.SeekContext()
    with pytest.raises(ValueError):
        vali.SeekContext(seek_frame=1, seek_ts=1.0)
    with pytest.raises(ValueError):
        vali.SeekContext(seek_frame=-1)


def test_tracing_scopes():
    from vali_tpu.utils import tracing

    with tracing.op_scope("TestOp"):
        pass
    tracing.enable(False)
    try:
        with tracing.op_scope("TestOpOff"):
            pass
    finally:
        tracing.enable(True)


def test_from_cai_honors_strides():
    """A CAI-style dict from a sliced/transposed producer carries byte
    strides; ignoring them garbles pixels (parity: reference
    PySurface.cpp:487-496 consumes strides). Advisor review round 4."""
    h, w = 32, 48
    base = np.arange(h * w * 2, dtype=np.uint8).reshape(h, w * 2)
    view = base[:, ::2]  # non-contiguous: stride (w*2, 2)
    d = {"shape": view.shape, "typestr": "|u1",
         "data": (view.ctypes.data, False),
         "strides": view.strides, "version": 3}
    surf = vali.Surface.from_cai(d, vali.PixelFormat.Y)
    assert np.array_equal(surf.to_numpy().reshape(h, w), view)

    # contiguous producers may pass strides=None per the CAI spec
    cont = np.ascontiguousarray(view)
    d2 = {"shape": cont.shape, "typestr": "|u1",
          "data": (cont.ctypes.data, False), "strides": None, "version": 3}
    surf2 = vali.Surface.from_cai(d2, vali.PixelFormat.Y)
    assert np.array_equal(surf2.to_numpy().reshape(h, w), view)

    with pytest.raises(ValueError, match="negative strides"):
        vali.Surface.from_cai(
            {"shape": (4, 4), "typestr": "|u1",
             "data": (cont.ctypes.data, False), "strides": (-4, 1)},
            vali.PixelFormat.Y)


def test_from_jax_explicit_dims_must_agree():
    """Explicit width/height that contradict the export shape must raise
    instead of silently deriving different dimensions."""
    import jax.numpy as jnp

    arr = jnp.zeros((96, 64), dtype=jnp.uint8)  # NV12 export: 64x64
    ok = vali.Surface.from_jax(arr, vali.PixelFormat.NV12,
                               width=64, height=64)
    assert (ok.Width, ok.Height) == (64, 64)
    with pytest.raises(ValueError, match="implies"):
        vali.Surface.from_jax(arr, vali.PixelFormat.NV12,
                              width=32, height=48)


def test_multiplane_dlpack_raises_runtime_error_not_tpu_hint():
    """__dlpack__ on a multi-plane surface must report the multi-plane
    cause (RuntimeError, like __dlpack_device__), not the TPU-resident
    hint — on the CPU backend that diagnosis would be doubly wrong."""
    surf = vali.Surface.Make(vali.PixelFormat.YUV420, 32, 32)
    with pytest.raises(RuntimeError, match="multi-plane"):
        surf.__dlpack__()
    with pytest.raises(RuntimeError, match="multi-plane"):
        surf.__dlpack_device__()


def test_make_allocates_on_target_device():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs multi-device mesh")
    dev = jax.devices()[3]
    surf = vali.Surface.Make(vali.PixelFormat.NV12, 64, 64, gpu_id=3)
    assert surf.device == dev
    for arr in surf.plane_arrays():
        assert next(iter(arr.devices())) == dev


def test_yuv_to_rgb_channels_high_bit_depth_is_msb_aligned():
    """bit_depth>8 means the MSB-aligned uint16 layout (P010/P012:
    v16 = v8*256) everywhere in this project; the channel converter must
    match the 8-bit result for the same 8-bit content."""
    from vali_tpu.ops.csc import yuv_to_rgb_channels

    rng = np.random.default_rng(5)
    y8 = rng.integers(16, 236, (1, 16, 32)).astype(np.float32)
    u8 = rng.integers(16, 241, (1, 16, 32)).astype(np.float32)
    v8 = rng.integers(16, 241, (1, 16, 32)).astype(np.float32)
    r8, g8, b8 = yuv_to_rgb_channels(
        y8, u8, v8, vali.ColorSpace.BT_709, vali.ColorRange.MPEG)
    r16, g16, b16 = yuv_to_rgb_channels(
        y8 * 256.0, u8 * 256.0, v8 * 256.0,
        vali.ColorSpace.BT_709, vali.ColorRange.MPEG, bit_depth=10)
    assert np.allclose(np.asarray(r16) / 256.0, np.asarray(r8), atol=1e-3)
    assert np.allclose(np.asarray(g16) / 256.0, np.asarray(g8), atol=1e-3)
    assert np.allclose(np.asarray(b16) / 256.0, np.asarray(b8), atol=1e-3)


def test_upload_snapshots_host_bytes():
    """Upload semantics copy the bytes as of call time (parity: CUDA
    H2D). On host-backed devices jax.device_put can zero-copy ALIAS the
    caller's numpy memory — mutating the frame after Run() must not
    change the surface (advisor review round 4; this bit the decoder's
    reused staging buffer for real)."""
    w, h = 128, 64
    frame = np.full(w * h * 3 // 2, 100, np.uint8)
    surf = vali.Surface.Make(vali.PixelFormat.NV12, w, h)
    up = vali.PyFrameUploader(gpu_id=0)
    assert up.Run(frame, surf)[0]
    frame[:] = 7  # caller reuses the buffer
    assert int(np.asarray(surf.plane_arrays()[0])[0, 0]) == 100

    surf2 = vali.Surface.from_numpy(frame.copy(), vali.PixelFormat.NV12,
                                    width=w, height=h)
    src2 = frame.copy()
    surf3 = vali.Surface.from_numpy(src2, vali.PixelFormat.NV12,
                                    width=w, height=h)
    src2[:] = 200
    assert np.array_equal(surf3.to_numpy(), surf2.to_numpy())
