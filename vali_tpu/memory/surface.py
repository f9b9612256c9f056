"""Device surfaces over ``jax.Array``.

TPU-native re-design of the reference's Surface/SurfacePlane hierarchy
(reference: src/TC/inc/MemoryInterfaces.hpp:156-266, src/TC/inc/Surfaces.hpp,
src/TC/inc/SurfacePlane.hpp). Differences by design:

  - Planes are dense ``jax.Array``s in HBM — no pitch (``Pitch`` returns the
    dense row stride in bytes for API parity).
  - ``jax.Array`` is immutable, so VALI's "op writes into a caller-provided
    Surface" contract is implemented by the Surface holding *mutable slots*
    of immutable arrays: ops compute new arrays and swap them into the
    destination Surface. Zero extra copies; the API shape is unchanged.
  - Zero-copy interop is DLPack both ways (``__dlpack__`` /
    ``Surface.from_dlpack``) plus first-class ``to_jax()`` / ``from_jax()``.
    The CUDA Array Interface (``__cuda_array_interface__``) has no TPU
    equivalent; ``from_cai`` ingests host-memory array-interface dicts
    instead (reference parity: PySurface.cpp:372-537).

One Surface class covers all 13 formats via the declarative layout table in
``vali_tpu.core.formats`` (vs 13 C++ subclasses in the reference).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.enums import PixelFormat
from ..core.formats import FormatInfo, format_info
from ..utils.device import get_device
from . import registry


def _device_of(arr) -> "jax.Device":
    devs = getattr(arr, "devices", None)
    if devs is not None:
        return next(iter(arr.devices()))
    return jax.devices()[0]


def _host_snapshot(a, device) -> np.ndarray:
    """Snapshot host bytes before a device_put targeting a HOST-backed
    device. jax.device_put can zero-copy ALIAS host numpy memory on
    CPU-family backends (observed even for multi-MB aligned planes with
    an explicit device arg), but upload semantics require the bytes as
    of call time — the reference's CUDA upload always copies. Real
    accelerators copy on transfer, so only host platforms pay this."""
    if getattr(device, "platform", None) == "cpu":
        # one copy serves both needs: contiguity and a call-time snapshot
        return np.array(a, order="C")
    return np.ascontiguousarray(a)


_TPU_DLPACK_HINT = (
    "DLPack export is not available for TPU-resident surfaces (the DLPack "
    "protocol has no TPU device type, and host frameworks cannot address "
    "HBM). Consume the surface as a jax.Array via Surface.to_jax() / "
    "SurfacePlane.to_jax() (zero-copy), or bring it to the host with "
    "Surface.to_numpy() / PySurfaceDownloader for torch and friends.")


class SurfacePlane:
    """A single dense 2-D plane of a Surface.

    Holds a reference to its parent surface and plane index so that when an
    op swaps new arrays into the surface, existing plane handles observe the
    update — matching the reference's shared_ptr plane semantics
    (SurfacePlane.hpp:52-285).
    """

    __slots__ = ("_surface", "_index")

    def __init__(self, surface: "Surface", index: int):
        self._surface = surface
        self._index = index

    @property
    def _array(self):
        arr = self._surface._arrays[self._index]
        if arr is None:
            raise RuntimeError("SurfacePlane is empty")
        return arr

    @property
    def Width(self) -> int:
        """Plane width in elements."""
        return int(self._array.shape[1])

    @property
    def Height(self) -> int:
        """Plane height in rows."""
        return int(self._array.shape[0])

    @property
    def ElemSize(self) -> int:
        """Element size in bytes."""
        return int(np.dtype(self._array.dtype).itemsize)

    @property
    def Pitch(self) -> int:
        """Dense row stride in bytes (no pitched allocations on TPU)."""
        return self.Width * self.ElemSize

    @property
    def HostFrameSize(self) -> int:
        """Plane size in bytes on the host."""
        return self.Width * self.Height * self.ElemSize

    @property
    def GpuMem(self) -> int:
        """Raw device buffer address if the backend exposes one, else 0."""
        try:
            return int(self._array.unsafe_buffer_pointer())
        except Exception:
            return 0

    def __dlpack__(self, stream=None, **kwargs):
        try:
            return self._array.__dlpack__(**kwargs)
        except (BufferError, RuntimeError) as e:
            # TPU backends raise JaxRuntimeError (a RuntimeError) from
            # __dlpack__ and BufferError from __dlpack_device__
            raise BufferError(_TPU_DLPACK_HINT) from e

    def __dlpack_device__(self):
        try:
            return self._array.__dlpack_device__()
        except BufferError as e:
            raise BufferError(_TPU_DLPACK_HINT) from e

    def to_jax(self):
        """Zero-copy handle to the plane's jax.Array."""
        return self._array

    def __repr__(self) -> str:
        return (f"SurfacePlane({self.Width}x{self.Height}, "
                f"elem={self.ElemSize})")


class Surface:
    """A pixel-format-typed image of 1..3 dense planes in device memory.

    Construct with :meth:`Make`, :meth:`from_jax`, :meth:`from_dlpack` or
    :meth:`from_numpy`.
    """

    def __init__(self, *args, **kwargs):
        if args or kwargs:
            raise TypeError(
                "Use Surface.Make(format, width, height, gpu_id=...) or "
                "Surface.from_jax/from_dlpack/from_numpy")
        self._format = PixelFormat.UNDEFINED
        self._width = 0
        self._height = 0
        self._arrays: List[Optional[jax.Array]] = []
        self._own_memory = True

    # --- construction -----------------------------------------------------

    @staticmethod
    def Make(format: PixelFormat, width: int, height: int,
             gpu_id: int = 0, context: Optional[int] = None,
             device: Optional["jax.Device"] = None) -> "Surface":
        """Allocate a zero-initialized surface on a device.

        Parity: reference Surface::Make (MemoryInterfaces.cpp:336-404). The
        ``context`` overload of the reference maps to passing an explicit
        ``device``.
        """
        info = format_info(format)
        info.validate(width, height)
        if gpu_id > 0xFFFF and context is None:
            # Compat shim: reference code may pass a CUcontext positionally
            # in the gpu_id slot (Surface.Make(fmt, w, h, context)); treat
            # pointer-sized values as a context and use the default device.
            context, gpu_id = gpu_id, 0
        if device is None:
            device = get_device(gpu_id)
        surf = Surface()
        surf._format = PixelFormat(format)
        surf._width = int(width)
        surf._height = int(height)
        dtype = jnp.dtype(info.dtype)
        # allocate directly on the target device: zeros-then-device_put
        # paid a cross-device copy per plane whenever gpu_id != 0
        with jax.default_device(device):
            surf._arrays = [
                jnp.zeros((h, w), dtype=dtype)
                for (h, w) in info.plane_dims(width, height)
            ]
        registry.register(surf, f"Surface[{surf._format.name}]",
                          info.host_size(width, height))
        return surf

    @staticmethod
    def from_jax(arrays, format: PixelFormat, width: Optional[int] = None,
                 height: Optional[int] = None) -> "Surface":
        """Wrap existing jax array(s) as a Surface (borrowed, zero-copy).

        ``arrays`` is either a single array in the format's export shape
        (e.g. (H, W, 3) for RGB, (3, H, W) for RGB_PLANAR, (H*3/2, W) for
        NV12) or a sequence of per-plane 2-D arrays in storage layout.
        """
        info = format_info(format)
        if isinstance(arrays, (list, tuple)):
            planes = [jnp.asarray(a) for a in arrays]
            if width is None or height is None:
                h0, w0 = planes[0].shape
                if format in (PixelFormat.NV12, PixelFormat.P10,
                              PixelFormat.P12):
                    height, width = h0 * 2 // 3, w0
                elif format in (PixelFormat.RGB, PixelFormat.BGR,
                                PixelFormat.RGB_32F):
                    height, width = h0, w0 // 3
                elif format in (PixelFormat.RGB_PLANAR,
                                PixelFormat.RGB_32F_PLANAR):
                    height, width = h0 // 3, w0
                else:
                    height, width = h0, w0
        else:
            arr = jnp.asarray(arrays)
            dw, dh, planes = _storage_from_export(arr, info)
            # an explicit width/height must AGREE with the export shape —
            # silently deriving different dimensions turns a caller's
            # mistake into a wrong-sized surface that only fails later
            if ((width is not None and int(width) != dw)
                    or (height is not None and int(height) != dh)):
                raise ValueError(
                    f"array of export shape {tuple(arr.shape)} implies "
                    f"{dw}x{dh}, but width={width} height={height} was "
                    f"requested")
            width, height = dw, dh
        info.validate(width, height)
        expected = info.plane_dims(width, height)
        if len(planes) != len(expected):
            raise ValueError(
                f"{format.name} needs {len(expected)} planes, "
                f"got {len(planes)}")
        for arr, (h, w) in zip(planes, expected):
            if tuple(arr.shape) != (h, w):
                raise ValueError(
                    f"Plane shape {tuple(arr.shape)} != expected {(h, w)} "
                    f"for {format.name} {width}x{height}")
            if np.dtype(arr.dtype) != info.dtype:
                raise ValueError(
                    f"Plane dtype {arr.dtype} != expected {info.dtype} "
                    f"for {format.name}")
        surf = Surface()
        surf._format = PixelFormat(format)
        surf._width = int(width)
        surf._height = int(height)
        surf._arrays = list(planes)
        surf._own_memory = False
        registry.register(surf, f"Surface[{surf._format.name}](borrowed)", 0)
        return surf

    @staticmethod
    def from_dlpack(obj, format: PixelFormat = PixelFormat.RGB) -> "Surface":
        """Import a DLPack tensor (capsule-producer object or array)."""
        arr = jnp.from_dlpack(obj)
        return Surface.from_jax(arr, format)

    @staticmethod
    def from_cai(d, format: PixelFormat = PixelFormat.RGB) -> "Surface":
        """Ingest an array-interface-style object.

        The reference imports GPU memory via __cuda_array_interface__
        (PySurface.cpp:468-537). TPUs have no raw-pointer ingestion, so this
        accepts (a) objects exposing ``__array_interface__`` /
        ``__array__`` (host memory, uploaded), or (b) cupy-style dicts with
        host-readable data.
        """
        if isinstance(d, dict):
            shape = tuple(d["shape"])
            dt = np.dtype(d["typestr"])
            data = d["data"]
            ptr = data[0] if isinstance(data, (tuple, list)) else int(data)
            strides = d.get("strides")
            if strides is None:  # C-contiguous per the CAI spec
                count = int(np.prod(shape))
                buf = (ctypes.c_char * (count * dt.itemsize))
                host = np.frombuffer(buf.from_address(ptr),
                                     dtype=dt).reshape(shape)
            else:
                # honor byte strides like the reference does
                # (PySurface.cpp:487-496): a sliced/transposed producer
                # is NOT C-contiguous and reshape would garble pixels
                strides = tuple(int(s) for s in strides)
                if any(s < 0 for s in strides):
                    raise ValueError(
                        "negative strides are not supported by "
                        "Surface.from_cai")
                span = dt.itemsize + sum(
                    (n - 1) * s for n, s in zip(shape, strides) if n > 0)
                flat = np.frombuffer(
                    (ctypes.c_char * span).from_address(ptr),
                    dtype=np.uint8)
                host = np.lib.stride_tricks.as_strided(
                    flat[:dt.itemsize].view(dt), shape=shape,
                    strides=strides)
            host = np.array(host)  # copy out of foreign memory
        else:
            host = np.asarray(d)
        return Surface.from_jax(jnp.asarray(host), format)

    @staticmethod
    def from_numpy(array, format: PixelFormat, gpu_id: int = 0,
                   device: Optional["jax.Device"] = None,
                   width: Optional[int] = None,
                   height: Optional[int] = None) -> "Surface":
        """Upload a host frame to a device.

        ``array`` may be a list of per-plane arrays, an export-shaped array,
        or a flat 1-D host frame (requires ``width``/``height``).
        """
        if device is None:
            device = get_device(gpu_id)
        if isinstance(array, (list, tuple)):
            planes = [jax.device_put(_host_snapshot(a, device), device)
                      for a in array]
            return Surface.from_jax(planes, format, width, height)
        if np.ndim(array) == 1:
            from .host import host_frame_to_planes
            if width is None or height is None:
                raise ValueError(
                    "flat host frames require explicit width/height")
            host_planes = host_frame_to_planes(
                np.ascontiguousarray(array), format, width, height)
            planes = [jax.device_put(_host_snapshot(p, device), device)
                      for p in host_planes]
            return Surface.from_jax(planes, format, width, height)
        arr = jax.device_put(_host_snapshot(array, device), device)
        return Surface.from_jax(arr, format, width, height)

    # --- mutation by ops ---------------------------------------------------

    def _replace_arrays(self, arrays: Sequence[jax.Array]) -> None:
        """Swap in op results (the functional analogue of writing into
        caller-provided device memory)."""
        if len(arrays) != len(self._arrays):
            raise ValueError("Plane count mismatch in _replace_arrays")
        self._arrays = list(arrays)

    # --- properties ---------------------------------------------------------

    @property
    def _info(self) -> FormatInfo:
        return format_info(self._format)

    @property
    def Format(self) -> PixelFormat:
        """Pixel format of this surface."""
        return self._format

    @property
    def Width(self) -> int:
        """Width in pixels (luma plane)."""
        return self._width

    @property
    def Height(self) -> int:
        """Height in pixels (luma plane)."""
        return self._height

    @property
    def NumPlanes(self) -> int:
        """Number of storage planes."""
        return len(self._arrays)

    @property
    def NumComponents(self) -> int:
        """Number of color components."""
        return self._info.num_components

    @property
    def IsEmpty(self) -> bool:
        """True when the surface has no allocated pixels."""
        return not self._arrays or any(a is None for a in self._arrays)

    @property
    def IsOwnMemory(self) -> bool:
        """True when the surface owns its memory (False for borrowed/imported views)."""
        return self._own_memory

    @property
    def HostSize(self) -> int:
        """Total size in bytes of the dense host representation."""
        return self._info.host_size(self._width, self._height)

    @property
    def Pitch(self) -> int:
        """Row pitch in bytes of the first plane (dense: width * elem size)."""
        return self.Planes[0].Pitch

    @property
    def Planes(self) -> Tuple[SurfacePlane, ...]:
        """Tuple of SurfacePlane views over the storage planes."""
        return tuple(SurfacePlane(self, i) for i in range(len(self._arrays)))

    @property
    def Shape(self) -> List[int]:
        """Export shape, or flat element count for multi-plane formats
        (parity: MemoryInterfaces.cpp:461-478)."""
        info = self._info
        if info.export_shape is not None:
            return list(info.export_shape(self._width, self._height))
        return [self.HostSize // info.elem_size]

    @property
    def device(self) -> "jax.Device":
        """The JAX device holding this surface's planes."""
        if self.IsEmpty:
            raise RuntimeError("Surface is empty")
        return _device_of(self._arrays[0])

    # --- interop -------------------------------------------------------------

    def to_jax(self) -> jax.Array:
        """The surface as ONE jax array in export shape (zero-copy where the
        storage layout allows; XLA reshapes are metadata-only)."""
        info = self._info
        if info.export_shape is None:
            raise RuntimeError(
                f"{self._format.name} is multi-plane; use .Planes / "
                f".plane_arrays()")
        arr = self._arrays[0]
        shape = info.export_shape(self._width, self._height)
        return arr.reshape(shape) if tuple(arr.shape) != tuple(shape) else arr

    def plane_arrays(self) -> Tuple[jax.Array, ...]:
        """Per-plane jax arrays in storage layout (zero-copy)."""
        if self.IsEmpty:
            raise RuntimeError("Surface is empty")
        return tuple(self._arrays)

    def to_numpy(self) -> np.ndarray:
        """Download to host in export shape (flat for multi-plane)."""
        info = self._info
        if info.export_shape is not None:
            return np.asarray(self.to_jax())
        return np.concatenate(
            [np.asarray(a).reshape(-1) for a in self._arrays])

    def __dlpack__(self, stream=None, **kwargs):
        # multi-plane surfaces raise the same RuntimeError as
        # __dlpack_device__ (NOT the TPU hint, which would misdiagnose
        # the failure on any backend)
        if self._info.export_shape is None:
            raise RuntimeError(
                f"{self._format.name} is multi-plane; DLPack export is "
                f"unsupported (parity: Surfaces.hpp:168-176)")
        try:
            return self.to_jax().__dlpack__(**kwargs)
        except (BufferError, RuntimeError) as e:
            raise BufferError(_TPU_DLPACK_HINT) from e

    def __dlpack_device__(self):
        if self._info.export_shape is None:
            raise RuntimeError(
                f"{self._format.name} is multi-plane; DLPack export is "
                f"unsupported (parity: Surfaces.hpp:168-176)")
        try:
            return self._arrays[0].__dlpack_device__()
        except BufferError as e:
            raise BufferError(_TPU_DLPACK_HINT) from e

    @property
    def __cuda_array_interface__(self):
        raise RuntimeError(
            "TPU surfaces do not expose __cuda_array_interface__; use "
            "__dlpack__ / to_jax() for zero-copy interop")

    def Clone(self) -> "Surface":
        """Deep copy (parity: MemoryInterfaces.cpp:406-433)."""
        if self.IsEmpty:
            raise RuntimeError("Cannot clone an empty surface")
        surf = Surface()
        surf._format = self._format
        surf._width = self._width
        surf._height = self._height
        surf._arrays = [jnp.copy(a) for a in self._arrays]
        surf._own_memory = True
        registry.register(surf, f"Surface[{surf._format.name}]",
                          self.HostSize)
        return surf

    def block_until_ready(self) -> "Surface":
        """Block until all device computation producing this surface finished; returns self."""
        for a in self._arrays:
            if a is not None:
                a.block_until_ready()
        return self

    def __repr__(self) -> str:
        if self.IsEmpty:
            return "Surface(<empty>)"
        return (f"Surface({self._format.name}, {self._width}x{self._height}, "
                f"planes={self.NumPlanes}, device={self.device})")


def _storage_from_export(arr: jax.Array, info: FormatInfo):
    """Convert an export-shaped array into storage-layout planes."""
    fmt = info.fmt
    if fmt in (PixelFormat.RGB, PixelFormat.BGR, PixelFormat.RGB_32F):
        if arr.ndim == 3:
            h, w, c = arr.shape
            if c != 3:
                raise ValueError(f"Expected (H, W, 3) for {fmt.name}")
            return int(w), int(h), [arr.reshape(h, w * 3)]
        h, w3 = arr.shape
        return int(w3 // 3), int(h), [arr]
    if fmt in (PixelFormat.RGB_PLANAR, PixelFormat.RGB_32F_PLANAR):
        if arr.ndim == 3:
            c, h, w = arr.shape
            if c != 3:
                raise ValueError(f"Expected (3, H, W) for {fmt.name}")
            return int(w), int(h), [arr.reshape(3 * h, w)]
        h3, w = arr.shape
        return int(w), int(h3 // 3), [arr]
    if arr.ndim != 2:
        raise ValueError(
            f"Expected a 2-D array for {fmt.name}, got shape {arr.shape}")
    h, w = arr.shape
    if fmt in (PixelFormat.NV12, PixelFormat.P10, PixelFormat.P12):
        return int(w), int(h * 2 // 3), [arr]
    return int(w), int(h), [arr]


class CudaBuffer:
    """1-D typed device buffer (API parity: reference CudaBuffer,
    MemoryInterfaces.hpp:119-151). Backed by a flat jax.Array of bytes."""

    def __init__(self, *args, **kwargs):
        if args or kwargs:
            raise TypeError("Use CudaBuffer.Make(elem_size, num_elems, gpu_id)")
        self._array = None
        self._elem_size = 0
        self._num_elems = 0

    @staticmethod
    def Make(elem_size: int, num_elems: int, gpu_id: int = 0) -> "CudaBuffer":
        """Allocate a typed 1-D device buffer (parity: MemoryInterfaces.cpp:300-321)."""
        buf = CudaBuffer()
        buf._elem_size = int(elem_size)
        buf._num_elems = int(num_elems)
        device = get_device(gpu_id)
        buf._array = jax.device_put(
            jnp.zeros(elem_size * num_elems, dtype=jnp.uint8), device)
        registry.register(buf, "CudaBuffer", elem_size * num_elems)
        return buf

    @property
    def ElemSize(self) -> int:
        """Element size in bytes."""
        return self._elem_size

    @property
    def NumElems(self) -> int:
        """Number of elements."""
        return self._num_elems

    @property
    def RawMemSize(self) -> int:
        """Total size in bytes."""
        return self._elem_size * self._num_elems

    @property
    def GpuMem(self) -> int:
        """Opaque device pointer-like handle (unsafe buffer pointer)."""
        try:
            return int(self._array.unsafe_buffer_pointer())
        except Exception:
            return 0

    def CopyFrom(self, other: "CudaBuffer", stream: int = 0,
                 gpu_id: Optional[int] = None) -> None:
        """Copy another buffer's contents into this one (device-to-device)."""
        if other.RawMemSize != self.RawMemSize:
            raise RuntimeError("CudaBuffer size mismatch in CopyFrom")
        # the copy lands on THIS buffer's device (jnp.copy would keep
        # the source's placement, silently migrating the buffer)
        dev = next(iter(self._array.devices()))
        self._array = jax.device_put(other._array, dev)

    def Clone(self) -> "CudaBuffer":
        """Deep-copy this buffer on the device."""
        buf = CudaBuffer()
        buf._elem_size = self._elem_size
        buf._num_elems = self._num_elems
        buf._array = jnp.copy(self._array)
        registry.register(buf, "CudaBuffer", buf.RawMemSize)
        return buf

    def to_jax(self) -> jax.Array:
        """The underlying jax array."""
        return self._array

    def to_numpy(self) -> np.ndarray:
        """Copy the buffer to a host numpy array."""
        return np.asarray(self._array)
