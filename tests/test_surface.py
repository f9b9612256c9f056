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
