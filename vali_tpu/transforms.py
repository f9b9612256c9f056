"""Surface transform wrappers: converter, resizer, rotator, UD, up/download.

These are the Py* classes of the public API (parity:
src/python_vali/src/PySurfaceConverter.cpp, PySurfaceResizer.cpp,
PySurfaceRotator.cpp, PySurfaceUD.cpp, PyFrameUploader.cpp,
PySurfaceDownloader.cpp). Each wraps the batched functional ops in
``vali_tpu.ops`` with N=1, jit-compiled per static (shape, format, params)
signature. ``Run`` blocks until the result is on device (the reference's
event record+wait); ``RunAsync`` returns immediately — JAX dispatch is
already asynchronous, the stream ledger tracks completion.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .core.details import ColorspaceConversionContext
from .core.enums import ColorRange, ColorSpace, PixelFormat, TaskExecInfo
from .memory.host import host_frame_to_planes, planes_to_host_frame
from .memory.surface import Surface
from .ops import csc, resize, rotate, ud
from .utils.device import get_device, get_stream
from .utils.tracing import op_scope

_OK = (True, TaskExecInfo.SUCCESS)


def _fail(info: TaskExecInfo) -> Tuple[bool, TaskExecInfo]:
    return (False, info)


@functools.partial(jax.jit, static_argnames=(
    "src_fmt", "dst_fmt", "w", "h", "cc", "use_pallas"))
def _jit_convert(planes, *, src_fmt, dst_fmt, w, h, cc, use_pallas=None):
    cc_ctx = (ColorspaceConversionContext(cc[0], cc[1])
              if cc is not None else None)
    return csc.convert_batch(planes, src_fmt, dst_fmt, w, h, cc_ctx,
                             use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=(
    "fmt", "sw", "sh", "dw", "dh", "method", "use_pallas"))
def _jit_resize(planes, *, fmt, sw, sh, dw, dh, method, use_pallas=None):
    return resize.resize_batch(planes, fmt, sw, sh, dw, dh, method,
                               use_pallas=use_pallas)


@functools.partial(jax.jit, static_argnames=(
    "fmt", "sw", "sh", "dw", "dh", "angle", "shift_x", "shift_y"))
def _jit_rotate(planes, *, fmt, sw, sh, dw, dh, angle, shift_x, shift_y):
    return rotate.rotate_batch(planes, fmt, sw, sh, dw, dh,
                               angle, shift_x, shift_y)


@functools.partial(jax.jit, static_argnames=("fmt", "sw", "sh", "dw", "dh"))
def _jit_rotate_dynamic(planes, angle, shift_x, shift_y, *, fmt, sw, sh,
                        dw, dh):
    """Arbitrary-angle rotation with angle/shifts as TRACED scalars: one
    compile per shape, not per angle (a per-frame varying angle would
    otherwise pay a full remote recompile every call)."""
    return rotate.rotate_batch(planes, fmt, sw, sh, dw, dh,
                               angle, shift_x, shift_y)


@functools.partial(jax.jit, static_argnames=(
    "src_fmt", "dst_fmt", "sw", "sh", "dw", "dh"))
def _jit_ud(planes, *, src_fmt, dst_fmt, sw, sh, dw, dh):
    return ud.ud_batch(planes, src_fmt, dst_fmt, sw, sh, dw, dh)


class _SurfaceOp:
    """Shared plumbing: device/stream selection and sync semantics."""

    def __init__(self, gpu_id: int = 0, stream: Optional[int] = None):
        self._gpu_id = gpu_id
        self._device = get_device(gpu_id)
        self._stream = get_stream(stream)

    @property
    def Stream(self) -> int:
        return self._stream.handle

    def _finish(self, dst: Surface, arrays, sync: bool):
        dst._replace_arrays([a[0] for a in arrays])
        self._stream.record_arrays(dst.plane_arrays())
        if sync:
            dst.block_until_ready()
        return _OK


class PySurfaceConverter(_SurfaceOp):
    """Pixel format / color space converter (23 conversion pairs).

    On TPU, NV12->RGB/BGR (uint8) routes to the banded Pallas kernel by
    default — ~5x the XLA path at 1080p, within 1-2 LSB of it (bfloat16
    coefficient rounding; PSNR > 54 dB vs the exact path). Construct
    with ``use_pallas=False`` for the bit-exact XLA route, or
    ``use_pallas=True`` to force the kernel (errors off-TPU). Every
    other conversion pair is bit-exact on every backend.
    """

    def __init__(self, gpu_id: int = 0, stream: Optional[int] = None,
                 use_pallas: Optional[bool] = None):
        super().__init__(gpu_id, stream)
        self._use_pallas = use_pallas

    @staticmethod
    def Conversions():
        """Supported (src, dst) pixel-format pairs (parity: TaskConvertSurface.cpp:966-994)."""
        return csc.supported_conversions()

    def _run(self, src: Surface, dst: Surface, cc_ctx, sync: bool):
        if src.Width != dst.Width or src.Height != dst.Height:
            return _fail(TaskExecInfo.INVALID_INPUT)
        if src.IsEmpty or dst.IsEmpty:
            return _fail(TaskExecInfo.INVALID_INPUT)
        cc = None
        if cc_ctx is not None:
            cc = (ColorSpace(cc_ctx.color_space),
                  ColorRange(cc_ctx.color_range))
        planes = tuple(p[None] for p in src.plane_arrays())
        try:
            with op_scope("ConvertSurface"):
                out = _jit_convert(planes, src_fmt=src.Format,
                                   dst_fmt=dst.Format, w=src.Width,
                                   h=src.Height, cc=cc,
                                   use_pallas=self._use_pallas)
        except csc.UnsupportedConversionParams:
            return _fail(TaskExecInfo.UNSUPPORTED_FMT_CONV_PARAMS)
        except KeyError:
            # parity: unsupported pair throws (TaskConvertSurface.cpp:1080)
            raise ValueError(
                f"Unsupported pixel format conversion: {src.Format.name} "
                f"-> {dst.Format.name}")
        return self._finish(dst, out, sync)

    def Run(self, src, dst, cc_ctx=None):
        """Convert src into dst synchronously (parity: PySurfaceConverter.cpp:76-84)."""
        return self._run(src, dst, cc_ctx, sync=True)

    def RunAsync(self, src, dst, cc_ctx=None):
        """Convert src into dst without waiting for device completion."""
        return self._run(src, dst, cc_ctx, sync=False)


class PySurfaceResizer(_SurfaceOp):
    """Lanczos resizer (parity: NPPI_INTER_LANCZOS, TaskResizeSurface.cpp)."""

    def __init__(self, format: PixelFormat, gpu_id: int = 0,
                 stream: Optional[int] = None, method: str = resize.LANCZOS,
                 turbo: bool = False, use_pallas: Optional[bool] = None):
        """``turbo=True`` (beyond reference) routes NV12/P10/P12 and
        the planar formats (Y/GRAY12/YUV420/YUV444/RGB_PLANAR/
        RGB_32F_PLANAR) through the banded Pallas resize kernels — ~9x
        the dense XLA path on TPU at 4K->1080p, within compute-dtype
        rounding of it (uint8 resizes in bfloat16 instead of float32;
        PSNR >48 dB, often bit-equal; float planes stay float32).

        The packed formats (RGB/BGR/RGB_32F) route to the banded Pallas
        packed resize BY DEFAULT on TPU (~3x the XLA einsum at
        1080p->224; uint8 computes in bfloat16, within 1 LSB — PSNR
        > 54 dB vs the exact path; float32 stays float32). Pass
        ``use_pallas=False`` for the bit-exact XLA route on packed
        formats, ``use_pallas=True`` to force the kernel. Planar and
        semi-planar formats in the default (non-turbo) mode always use
        the exact XLA path."""
        super().__init__(gpu_id, stream)
        format = PixelFormat(format)
        if format not in resize.SUPPORTED_FORMATS:
            raise RuntimeError(f"pixel format not supported: {format.name}")
        self._format = format
        self._method = method
        self._turbo = turbo
        self._use_pallas = use_pallas

    @property
    def Format(self) -> PixelFormat:
        """Pixel format this resizer was constructed for."""
        return self._format

    def _run(self, src: Surface, dst: Surface, sync: bool):
        if src.Format != self._format or dst.Format != self._format:
            return _fail(TaskExecInfo.SRC_DST_FMT_MISMATCH)
        if src.IsEmpty or dst.IsEmpty:
            return _fail(TaskExecInfo.INVALID_INPUT)
        planes = tuple(p[None] for p in src.plane_arrays())
        fmt = self._format
        semi = fmt in (PixelFormat.NV12, PixelFormat.P10, PixelFormat.P12)
        planar = fmt in (PixelFormat.Y, PixelFormat.GRAY12,
                         PixelFormat.YUV420, PixelFormat.YUV444,
                         PixelFormat.RGB_PLANAR, PixelFormat.RGB_32F_PLANAR)
        with op_scope("ResizeSurface"):
            # (semi-planar Surfaces cannot have odd dims — FormatInfo
            # validates at construction — so no parity guard is needed)
            if self._turbo and (semi or planar):
                import jax

                from .ops.pallas_fused import (pallas_nv12_resize,
                                               pallas_plane_resize)

                interp = jax.default_backend() == "cpu"
                dw, dh = dst.Width, dst.Height
                if semi:
                    out = (pallas_nv12_resize(
                        planes[0], src_w=src.Width, src_h=src.Height,
                        dst_w=dw, dst_h=dh, method=self._method,
                        interpret=interp),)
                elif fmt in (PixelFormat.YUV444,):
                    stacked = jnp.concatenate(planes, axis=0)
                    r = pallas_plane_resize(
                        stacked, src_h=src.Height, dst_h=dh, dst_w=dw,
                        method=self._method, interpret=interp)
                    out = tuple(r[i:i + 1] for i in range(3))
                elif fmt in (PixelFormat.RGB_PLANAR,
                             PixelFormat.RGB_32F_PLANAR):
                    n, h3, w = planes[0].shape
                    chans = planes[0].reshape(3, h3 // 3, w)
                    r = pallas_plane_resize(
                        chans, src_h=src.Height, dst_h=dh, dst_w=dw,
                        method=self._method, interpret=interp)
                    out = (r.reshape(1, 3 * dh, dw),)
                elif fmt == PixelFormat.YUV420:
                    y = pallas_plane_resize(
                        planes[0], src_h=src.Height, dst_h=dh, dst_w=dw,
                        method=self._method, interpret=interp)
                    c = pallas_plane_resize(
                        jnp.concatenate(planes[1:], axis=0),
                        src_h=src.Height // 2, dst_h=dh // 2,
                        dst_w=dw // 2, method=self._method,
                        interpret=interp)
                    out = (y, c[0:1], c[1:2])
                else:  # Y / GRAY12
                    out = (pallas_plane_resize(
                        planes[0], src_h=src.Height, dst_h=dh, dst_w=dw,
                        method=self._method, interpret=interp),)
            else:
                out = _jit_resize(planes, fmt=fmt, sw=src.Width,
                                  sh=src.Height, dw=dst.Width,
                                  dh=dst.Height, method=self._method,
                                  use_pallas=self._use_pallas)
        return self._finish(dst, out, sync)

    def Run(self, src, dst):
        """Resize src into dst (Lanczos by default) synchronously."""
        return self._run(src, dst, sync=True)

    def RunAsync(self, src, dst):
        """Resize src into dst without waiting for device completion."""
        return self._run(src, dst, sync=False)


class PySurfaceRotator(_SurfaceOp):
    """Arbitrary-angle rotator (parity: nppiRotate, NPPI_INTER_LINEAR)."""

    @property
    def SupportedFormats(self):
        """Pixel formats the rotator accepts."""
        return list(rotate.SUPPORTED_FORMATS)

    def _run(self, src: Surface, dst: Surface, angle, shift_x, shift_y,
             sync: bool):
        if src.Format != dst.Format:
            return _fail(TaskExecInfo.SRC_DST_FMT_MISMATCH)
        if src.Format not in rotate.SUPPORTED_FORMATS:
            return _fail(TaskExecInfo.NOT_SUPPORTED)
        if src.IsEmpty or dst.IsEmpty:
            return _fail(TaskExecInfo.INVALID_INPUT)
        planes = tuple(p[None] for p in src.plane_arrays())
        import math as _math

        angle, shift_x, shift_y = float(angle), float(shift_x), float(shift_y)
        # Static (rot90-lowered) path only for the canonical right-angle
        # cases: a right angle with an arbitrary per-call shift must take
        # the traced-scalar path, else every distinct shift value is a
        # fresh jit entry (a 30-240s remote compile per frame on axon for
        # e.g. a pan).
        right_angle = _math.fmod(angle, 90.0) == 0.0 and (
            (shift_x == 0.0 and shift_y == 0.0)
            or rotate._is_canonical_right_angle(
                float(int(round(angle)) % 360), shift_x, shift_y,
                src.Width, src.Height))
        with op_scope("RotateSurface"):
            if right_angle:
                # few canonical variants: static args keep the rot90
                # layout-transform lowering
                out = _jit_rotate(planes, fmt=src.Format, sw=src.Width,
                                  sh=src.Height, dw=dst.Width,
                                  dh=dst.Height, angle=angle,
                                  shift_x=shift_x, shift_y=shift_y)
            else:
                out = _jit_rotate_dynamic(
                    planes, jnp.float32(angle), jnp.float32(shift_x),
                    jnp.float32(shift_y), fmt=src.Format, sw=src.Width,
                    sh=src.Height, dw=dst.Width, dh=dst.Height)
        return self._finish(dst, out, sync)

    def Run(self, src, dst, angle, shift_x=0.0, shift_y=0.0):
        """Rotate src by ``angle`` degrees (with optional shift) into dst, synchronously (parity: RotateSurface.cpp)."""
        return self._run(src, dst, angle, shift_x, shift_y, sync=True)

    def RunAsync(self, src, dst, angle, shift_x=0.0, shift_y=0.0):
        """Rotate src into dst without waiting for device completion."""
        return self._run(src, dst, angle, shift_x, shift_y, sync=False)


class PySurfaceUD(_SurfaceOp):
    """Fused upsample-downscale-convert (parity: UDSurface)."""

    @staticmethod
    def SupportedFormats():
        """Supported (src, dst) pairs (parity: UDSurface.cpp:117-133)."""
        return list(ud.SUPPORTED_CONVERSIONS)

    def _run(self, src: Surface, dst: Surface, sync: bool):
        if (src.Format, dst.Format) not in ud.SUPPORTED_CONVERSIONS:
            return _fail(TaskExecInfo.NOT_SUPPORTED)
        if src.IsEmpty or dst.IsEmpty:
            return _fail(TaskExecInfo.INVALID_INPUT)
        planes = tuple(p[None] for p in src.plane_arrays())
        with op_scope("UDSurface"):
            out = _jit_ud(planes, src_fmt=src.Format, dst_fmt=dst.Format,
                          sw=src.Width, sh=src.Height,
                          dw=dst.Width, dh=dst.Height)
        return self._finish(dst, out, sync)

    def Run(self, src, dst):
        """Fused chroma-upsample + rescale + optional CSC, synchronously (parity: UDSurface.cpp:135-182)."""
        return self._run(src, dst, sync=True)

    def RunAsync(self, src, dst):
        """Fused upsample-downscale without waiting for device completion."""
        return self._run(src, dst, sync=False)


class PyFrameUploader:
    """Host frame -> device Surface (parity: CudaUploadFrame)."""

    def __init__(self, gpu_id: int = 0, stream: Optional[int] = None):
        self._device = get_device(gpu_id)
        self._stream = get_stream(stream)

    def Run(self, src: np.ndarray, dst: Surface):
        """Copy a host frame into the device surface (parity:
        PyFrameUploader.cpp — size mismatches fail with INVALID_INPUT;
        only the DOWNLOADER auto-resizes in the reference)."""
        try:
            flat = np.ascontiguousarray(src).reshape(-1).view(np.uint8)
            if flat.nbytes != dst.HostSize:
                return _fail(TaskExecInfo.INVALID_INPUT)
            host_planes = host_frame_to_planes(
                flat, dst.Format, dst.Width, dst.Height)
            from .memory.surface import _host_snapshot

            with op_scope("CudaUploadFrame"):
                # snapshot before device_put: on host-backed devices the
                # transfer may alias the caller's memory, but upload
                # semantics (parity: CUDA H2D) copy the bytes as of now
                arrays = [jax.device_put(_host_snapshot(p, self._device),
                                         self._device)
                          for p in host_planes]
            dst._replace_arrays(arrays)
            self._stream.record_arrays(arrays)
            return _OK
        except (ValueError, TypeError):
            return _fail(TaskExecInfo.INVALID_INPUT)


class PySurfaceDownloader:
    """Device Surface -> host numpy (parity: CudaDownloadSurface).

    Like the reference, the destination array is resized when its byte size
    does not match (PySurfaceDownloader.cpp numpy auto-resize)."""

    def __init__(self, gpu_id: int = 0, stream: Optional[int] = None):
        self._device = get_device(gpu_id)
        self._stream = get_stream(stream)

    def Run(self, src: Surface, dst: np.ndarray):
        """Copy a device surface into the host array (parity: PySurfaceDownloader.cpp)."""
        if src.IsEmpty:
            return _fail(TaskExecInfo.INVALID_INPUT)
        with op_scope("CudaDownloadSurface"):
            flat = planes_to_host_frame(src.plane_arrays())
        if flat.nbytes % dst.dtype.itemsize:
            return _fail(TaskExecInfo.INVALID_INPUT)
        if dst.nbytes != flat.nbytes:
            try:
                dst.resize((flat.nbytes // dst.dtype.itemsize,),
                           refcheck=False)
            except ValueError:
                return _fail(TaskExecInfo.INVALID_INPUT)
        view = dst.reshape(-1)
        if not np.shares_memory(view, dst):
            # reshape had to copy (non-contiguous dst): writing into the
            # copy would silently lose the data
            return _fail(TaskExecInfo.INVALID_INPUT)
        view.view(np.uint8)[:] = flat
        return _OK
