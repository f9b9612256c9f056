"""vali-tpu: a TPU-native video processing framework.

Public API parity with the reference `python_vali` package (see SURVEY.md):
decode/encode/transcode plus device surface transforms, re-designed for
TPU: JAX/XLA/Pallas compute, dense HBM surfaces, batched-first kernels.
"""

__version__ = "0.1.0"

from .core.enums import (  # noqa: F401
    NO_PTS,
    ColorRange,
    ColorSpace,
    DecodeMode,
    DLDeviceType,
    FfmpegLogLevel,
    NV_ENC_CAPS,
    PixelFormat,
    SeekMode,
    TaskExecInfo,
    TaskExecStatus,
)
from .core.details import (  # noqa: F401
    MOTION_VECTOR_DTYPE,
    ColorspaceConversionContext,
    MotionVector,
    PacketData,
    SeekContext,
    StreamParams,
    TaskExecDetails,
)
from .memory.surface import CudaBuffer, Surface, SurfacePlane  # noqa: F401
from .utils.device import CudaStreamEvent, num_devices  # noqa: F401

# Enum members re-exported at module level, matching the reference's
# pybind11 export style (VALI.cpp exports each enum value as a module attr).
for _enum in (PixelFormat, ColorSpace, ColorRange, TaskExecInfo, DecodeMode,
              FfmpegLogLevel, NV_ENC_CAPS, DLDeviceType):
    for _m in _enum:
        if _m.name not in globals():
            globals()[_m.name] = _m
del _enum, _m


def GetNumGpus() -> int:
    """Number of accelerator devices (parity: reference VALI.cpp:498)."""
    return num_devices()


_LAZY = {
    "PyDecoder": ".engine.decoder",
    "BufferedReader": ".engine.decoder",
    "PyFrameConverter": ".engine.frame_converter",
    "PyNvEncoder": ".engine.encoder",
    "PyMuxer": ".engine.muxer",
    "PyNvJpegEncoder": ".engine.jpeg",
    "NvJpegEncodeContext": ".engine.jpeg",
    "GetNvencParams": ".engine.encoder",
    "SetFFMpegLogLevel": ".engine.decoder",
    "PySurfaceConverter": ".transforms",
    "PySurfaceResizer": ".transforms",
    "PySurfaceRotator": ".transforms",
    "PySurfaceUD": ".transforms",
    "PyFrameUploader": ".transforms",
    "PySurfaceDownloader": ".transforms",
}


def __getattr__(name):
    mod_path = _LAZY.get(name)
    if mod_path is None:
        raise AttributeError(f"module 'vali_tpu' has no attribute {name!r}")
    import importlib

    mod = importlib.import_module(mod_path, __name__)
    val = getattr(mod, name)
    globals()[name] = val
    return val


def __dir__():
    return sorted(set(list(globals().keys()) + list(_LAZY.keys())))
