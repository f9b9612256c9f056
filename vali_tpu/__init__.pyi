"""Type stub for vali_tpu (parity: reference src/python_vali/__init__.pyi)."""

import enum
from typing import Dict, List, Optional, Tuple, Union, overload

import numpy

class PixelFormat(enum.IntEnum):
    UNDEFINED: int
    Y: int
    RGB: int
    NV12: int
    YUV420: int
    RGB_PLANAR: int
    BGR: int
    YUV444: int
    RGB_32F: int
    RGB_32F_PLANAR: int
    YUV422: int
    P10: int
    P12: int
    YUV444_10bit: int
    YUV420_10bit: int
    GRAY12: int

class ColorSpace(enum.IntEnum):
    BT_601: int
    BT_709: int
    UNSPEC: int

class ColorRange(enum.IntEnum):
    MPEG: int
    JPEG: int
    UDEF: int

class TaskExecStatus(enum.IntEnum):
    TASK_EXEC_SUCCESS: int
    TASK_EXEC_FAIL: int

class TaskExecInfo(enum.IntEnum):
    SUCCESS: int
    FAIL: int
    END_OF_STREAM: int
    MORE_DATA_NEEDED: int
    BIT_DEPTH_NOT_SUPPORTED: int
    INVALID_INPUT: int
    UNSUPPORTED_FMT_CONV_PARAMS: int
    NOT_SUPPORTED: int
    RES_CHANGE: int
    SRC_DST_SIZE_MISMATCH: int
    SRC_DST_FMT_MISMATCH: int

class DecodeMode(enum.IntEnum):
    ALL_FRAMES: int
    KEY_FRAMES: int

class SeekMode(enum.IntEnum):
    BY_FRAME: int
    BY_TIMESTAMP: int

class FfmpegLogLevel(enum.IntEnum):
    PANIC: int
    FATAL: int
    ERROR: int
    WARNING: int
    INFO: int
    VERBOSE: int
    DEBUG: int

class DLDeviceType(enum.IntEnum):
    kDLCPU: int
    kDLCUDA: int
    kDLCUDAHost: int
    kDLCUDAManaged: int

class NV_ENC_CAPS(enum.IntEnum):
    NUM_MAX_BFRAMES: int
    SUPPORTED_RATECONTROL_MODES: int
    SUPPORT_FIELD_ENCODING: int
    SUPPORT_MONOCHROME: int
    SUPPORT_FMO: int
    SUPPORT_QPELMV: int
    SUPPORT_BDIRECT_MODE: int
    SUPPORT_CABAC: int
    SUPPORT_ADAPTIVE_TRANSFORM: int
    SUPPORT_STEREO_MVC: int
    NUM_MAX_TEMPORAL_LAYERS: int
    SUPPORT_HIERARCHICAL_PFRAMES: int
    SUPPORT_HIERARCHICAL_BFRAMES: int
    LEVEL_MAX: int
    LEVEL_MIN: int
    SEPARATE_COLOUR_PLANE: int
    WIDTH_MAX: int
    HEIGHT_MAX: int
    SUPPORT_TEMPORAL_SVC: int
    SUPPORT_DYN_RES_CHANGE: int
    SUPPORT_DYN_BITRATE_CHANGE: int
    SUPPORT_DYN_FORCE_CONSTQP: int
    SUPPORT_DYN_RCMODE_CHANGE: int
    SUPPORT_SUBFRAME_READBACK: int
    SUPPORT_CONSTRAINED_ENCODING: int
    SUPPORT_INTRA_REFRESH: int
    SUPPORT_CUSTOM_VBV_BUF_SIZE: int
    SUPPORT_DYNAMIC_SLICE_MODE: int
    SUPPORT_REF_PIC_INVALIDATION: int
    PREPROC_SUPPORT: int
    ASYNC_ENCODE_SUPPORT: int
    MB_NUM_MAX: int
    MB_PER_SEC_MAX: int
    SUPPORT_YUV444_ENCODE: int
    SUPPORT_LOSSLESS_ENCODE: int
    SUPPORT_SAO: int
    SUPPORT_MEONLY_MODE: int
    SUPPORT_LOOKAHEAD: int
    SUPPORT_TEMPORAL_AQ: int
    SUPPORT_10BIT_ENCODE: int
    NUM_MAX_LTR_FRAMES: int
    SUPPORT_WEIGHTED_PREDICTION: int
    DYNAMIC_QUERY_ENCODER_CAPACITY: int
    SUPPORT_BFRAME_REF_MODE: int
    SUPPORT_EMPHASIS_LEVEL_MAP: int
    WIDTH_MIN: int
    HEIGHT_MIN: int
    SUPPORT_MULTIPLE_REF_FRAMES: int
    SUPPORT_ALPHA_LAYER_ENCODING: int
    EXPOSED_COUNT: int


NO_PTS: int

# Enum members exported at module level (reference VALI.cpp pybind11
# export style; see __init__.py)
ALL_FRAMES: DecodeMode
ASYNC_ENCODE_SUPPORT: NV_ENC_CAPS
BGR: PixelFormat
BIT_DEPTH_NOT_SUPPORTED: TaskExecInfo
BT_601: ColorSpace
BT_709: ColorSpace
DEBUG: FfmpegLogLevel
DYNAMIC_QUERY_ENCODER_CAPACITY: NV_ENC_CAPS
END_OF_STREAM: TaskExecInfo
ERROR: FfmpegLogLevel
EXPOSED_COUNT: NV_ENC_CAPS
FAIL: TaskExecInfo
FATAL: FfmpegLogLevel
GRAY12: PixelFormat
HEIGHT_MAX: NV_ENC_CAPS
HEIGHT_MIN: NV_ENC_CAPS
INFO: FfmpegLogLevel
INVALID_INPUT: TaskExecInfo
JPEG: ColorRange
KEY_FRAMES: DecodeMode
LEVEL_MAX: NV_ENC_CAPS
LEVEL_MIN: NV_ENC_CAPS
MB_NUM_MAX: NV_ENC_CAPS
MB_PER_SEC_MAX: NV_ENC_CAPS
MORE_DATA_NEEDED: TaskExecInfo
MPEG: ColorRange
NOT_SUPPORTED: TaskExecInfo
NUM_MAX_BFRAMES: NV_ENC_CAPS
NUM_MAX_LTR_FRAMES: NV_ENC_CAPS
NUM_MAX_TEMPORAL_LAYERS: NV_ENC_CAPS
NV12: PixelFormat
P10: PixelFormat
P12: PixelFormat
PANIC: FfmpegLogLevel
PREPROC_SUPPORT: NV_ENC_CAPS
RES_CHANGE: TaskExecInfo
RGB: PixelFormat
RGB_32F: PixelFormat
RGB_32F_PLANAR: PixelFormat
RGB_PLANAR: PixelFormat
SEPARATE_COLOUR_PLANE: NV_ENC_CAPS
SRC_DST_FMT_MISMATCH: TaskExecInfo
SRC_DST_SIZE_MISMATCH: TaskExecInfo
SUCCESS: TaskExecInfo
SUPPORTED_RATECONTROL_MODES: NV_ENC_CAPS
SUPPORT_10BIT_ENCODE: NV_ENC_CAPS
SUPPORT_ADAPTIVE_TRANSFORM: NV_ENC_CAPS
SUPPORT_ALPHA_LAYER_ENCODING: NV_ENC_CAPS
SUPPORT_BDIRECT_MODE: NV_ENC_CAPS
SUPPORT_BFRAME_REF_MODE: NV_ENC_CAPS
SUPPORT_CABAC: NV_ENC_CAPS
SUPPORT_CONSTRAINED_ENCODING: NV_ENC_CAPS
SUPPORT_CUSTOM_VBV_BUF_SIZE: NV_ENC_CAPS
SUPPORT_DYNAMIC_SLICE_MODE: NV_ENC_CAPS
SUPPORT_DYN_BITRATE_CHANGE: NV_ENC_CAPS
SUPPORT_DYN_FORCE_CONSTQP: NV_ENC_CAPS
SUPPORT_DYN_RCMODE_CHANGE: NV_ENC_CAPS
SUPPORT_DYN_RES_CHANGE: NV_ENC_CAPS
SUPPORT_EMPHASIS_LEVEL_MAP: NV_ENC_CAPS
SUPPORT_FIELD_ENCODING: NV_ENC_CAPS
SUPPORT_FMO: NV_ENC_CAPS
SUPPORT_HIERARCHICAL_BFRAMES: NV_ENC_CAPS
SUPPORT_HIERARCHICAL_PFRAMES: NV_ENC_CAPS
SUPPORT_INTRA_REFRESH: NV_ENC_CAPS
SUPPORT_LOOKAHEAD: NV_ENC_CAPS
SUPPORT_LOSSLESS_ENCODE: NV_ENC_CAPS
SUPPORT_MEONLY_MODE: NV_ENC_CAPS
SUPPORT_MONOCHROME: NV_ENC_CAPS
SUPPORT_MULTIPLE_REF_FRAMES: NV_ENC_CAPS
SUPPORT_QPELMV: NV_ENC_CAPS
SUPPORT_REF_PIC_INVALIDATION: NV_ENC_CAPS
SUPPORT_SAO: NV_ENC_CAPS
SUPPORT_STEREO_MVC: NV_ENC_CAPS
SUPPORT_SUBFRAME_READBACK: NV_ENC_CAPS
SUPPORT_TEMPORAL_AQ: NV_ENC_CAPS
SUPPORT_TEMPORAL_SVC: NV_ENC_CAPS
SUPPORT_WEIGHTED_PREDICTION: NV_ENC_CAPS
SUPPORT_YUV444_ENCODE: NV_ENC_CAPS
UDEF: ColorRange
UNDEFINED: PixelFormat
UNSPEC: ColorSpace
UNSUPPORTED_FMT_CONV_PARAMS: TaskExecInfo
VERBOSE: FfmpegLogLevel
WARNING: FfmpegLogLevel
WIDTH_MAX: NV_ENC_CAPS
WIDTH_MIN: NV_ENC_CAPS
Y: PixelFormat
YUV420: PixelFormat
YUV420_10bit: PixelFormat
YUV422: PixelFormat
YUV444: PixelFormat
YUV444_10bit: PixelFormat
kDLCPU: DLDeviceType
kDLCUDA: DLDeviceType
kDLCUDAHost: DLDeviceType
kDLCUDAManaged: DLDeviceType


class TaskExecDetails:
    status: TaskExecStatus
    info: TaskExecInfo
    message: str
    @property
    def ok(self) -> bool: ...

class ColorspaceConversionContext:
    color_space: ColorSpace
    color_range: ColorRange
    def __init__(self, color_space: ColorSpace = ...,
                 color_range: ColorRange = ...) -> None: ...

class SeekContext:
    seek_frame: int
    seek_tssec: float
    mode: SeekMode
    def __init__(self, seek_frame: Optional[int] = ...,
                 seek_ts: Optional[float] = ...) -> None: ...

class PacketData:
    pts: int
    dts: int
    pos: int
    bsl: int
    duration: int
    key: int

MOTION_VECTOR_DTYPE: numpy.dtype

class MotionVector:
    source: int
    w: int
    h: int
    src_x: int
    src_y: int
    dst_x: int
    dst_y: int
    motion_x: int
    motion_y: int
    motion_scale: int

class StreamParams:
    width: int
    height: int
    fourcc: int
    codec_id: int
    fps: float
    avg_fps: float
    time_base: float
    start_time: int
    start_time_sec: float
    duration_sec: float
    bit_rate: int
    num_frames: int
    profile: int
    level: int
    color_space: ColorSpace
    color_range: ColorRange

class SurfacePlane:
    @property
    def Width(self) -> int: ...
    @property
    def Height(self) -> int: ...
    @property
    def Pitch(self) -> int: ...
    @property
    def ElemSize(self) -> int: ...
    @property
    def HostFrameSize(self) -> int: ...
    @property
    def GpuMem(self) -> int: ...
    def __dlpack__(self, stream: Optional[int] = ...): ...
    def __dlpack_device__(self) -> Tuple[int, int]: ...
    def to_jax(self): ...

class Surface:
    @staticmethod
    def Make(format: PixelFormat, width: int, height: int, gpu_id: int = ...,
             context: Optional[int] = ..., device=...) -> "Surface": ...
    @staticmethod
    def from_dlpack(obj, format: PixelFormat = ...) -> "Surface": ...
    @staticmethod
    def from_cai(d, format: PixelFormat = ...) -> "Surface": ...
    @staticmethod
    def from_jax(arrays, format: PixelFormat, width: Optional[int] = ...,
                 height: Optional[int] = ...) -> "Surface": ...
    @staticmethod
    def from_numpy(array, format: PixelFormat, gpu_id: int = ...,
                   device=..., width: Optional[int] = ...,
                   height: Optional[int] = ...) -> "Surface": ...
    def Clone(self) -> "Surface": ...
    def to_jax(self): ...
    def to_numpy(self) -> numpy.ndarray: ...
    def plane_arrays(self) -> tuple: ...
    def block_until_ready(self) -> "Surface": ...
    def __dlpack__(self, stream: Optional[int] = ...): ...
    def __dlpack_device__(self) -> Tuple[int, int]: ...
    @property
    def Format(self) -> PixelFormat: ...
    @property
    def Width(self) -> int: ...
    @property
    def Height(self) -> int: ...
    @property
    def NumPlanes(self) -> int: ...
    @property
    def NumComponents(self) -> int: ...
    @property
    def IsEmpty(self) -> bool: ...
    @property
    def IsOwnMemory(self) -> bool: ...
    @property
    def HostSize(self) -> int: ...
    @property
    def Pitch(self) -> int: ...
    @property
    def Planes(self) -> Tuple[SurfacePlane, ...]: ...
    @property
    def Shape(self) -> List[int]: ...

class CudaBuffer:
    @staticmethod
    def Make(elem_size: int, num_elems: int, gpu_id: int = ...) -> "CudaBuffer": ...
    def Clone(self) -> "CudaBuffer": ...
    def CopyFrom(self, other: "CudaBuffer", stream: int = ...,
                 gpu_id: Optional[int] = ...) -> None: ...
    @property
    def ElemSize(self) -> int: ...
    @property
    def NumElems(self) -> int: ...
    @property
    def RawMemSize(self) -> int: ...
    @property
    def GpuMem(self) -> int: ...

class CudaStreamEvent:
    def __init__(self, stream: int = ..., gpu_id: int = ...) -> None: ...
    def Record(self) -> None: ...
    def Wait(self) -> None: ...

class BufferedReader:
    def __init__(self, obj) -> None: ...

class PyDecoder:
    def __init__(self, input, opts: Optional[Dict[str, str]] = ...,
                 gpu_id: int = ...) -> None: ...
    @overload
    def DecodeSingleFrame(self, frame: numpy.ndarray,
                          seek_ctx: Optional[SeekContext] = ...
                          ) -> Tuple[bool, TaskExecInfo]: ...
    @overload
    def DecodeSingleFrame(self, frame: numpy.ndarray, pkt_data: PacketData,
                          seek_ctx: Optional[SeekContext] = ...
                          ) -> Tuple[bool, TaskExecInfo]: ...
    def DecodeSingleSurface(self, surf: Surface, pkt_data=..., seek_ctx=...
                            ) -> Tuple[bool, TaskExecInfo]: ...
    def DecodeSingleSurfaceAsync(self, surf: Surface, pkt_data=...,
                                 seek_ctx=...) -> Tuple[bool, TaskExecInfo]: ...
    @staticmethod
    def Probe(input: str) -> List[StreamParams]: ...
    def SetMode(self, mode: DecodeMode) -> None: ...
    @property
    def Mode(self) -> DecodeMode: ...
    @property
    def Width(self) -> int: ...
    @property
    def Height(self) -> int: ...
    @property
    def Level(self) -> int: ...
    @property
    def Profile(self) -> int: ...
    @property
    def Delay(self) -> int: ...
    @property
    def GopSize(self) -> int: ...
    @property
    def Bitrate(self) -> int: ...
    @property
    def NumFrames(self) -> int: ...
    @property
    def NumStreams(self) -> int: ...
    @property
    def StreamIndex(self) -> int: ...
    @property
    def HostFrameSize(self) -> int: ...
    @property
    def Framerate(self) -> float: ...
    @property
    def AvgFramerate(self) -> float: ...
    @property
    def Timebase(self) -> float: ...
    @property
    def StartTime(self) -> float: ...
    @property
    def Duration(self) -> float: ...
    @property
    def ColorSpace(self) -> ColorSpace: ...
    @property
    def ColorRange(self) -> ColorRange: ...
    @property
    def Format(self) -> PixelFormat: ...
    @property
    def IsVFR(self) -> bool: ...
    @property
    def IsAccelerated(self) -> bool: ...
    @property
    def Stream(self) -> int: ...
    @property
    def Metadata(self) -> Dict[str, Dict[str, str]]: ...
    @property
    def MotionVectors(self) -> numpy.ndarray: ...
    @property
    def DisplayRotation(self) -> float: ...

class PyFrameConverter:
    def __init__(self, width: int, height: int, src_format: PixelFormat,
                 dst_format: PixelFormat) -> None: ...
    def Run(self, src: numpy.ndarray, dst: numpy.ndarray,
            cc_ctx: Optional[ColorspaceConversionContext] = ...
            ) -> Tuple[bool, TaskExecInfo]: ...
    @property
    def Format(self) -> PixelFormat: ...

class PyFrameUploader:
    def __init__(self, gpu_id: int = ..., stream: Optional[int] = ...) -> None: ...
    def Run(self, src: numpy.ndarray, dst: Surface) -> Tuple[bool, TaskExecInfo]: ...

class PySurfaceDownloader:
    def __init__(self, gpu_id: int = ..., stream: Optional[int] = ...) -> None: ...
    def Run(self, src: Surface, dst: numpy.ndarray) -> Tuple[bool, TaskExecInfo]: ...

class PySurfaceConverter:
    def __init__(self, gpu_id: int = ..., stream: Optional[int] = ...,
                 use_pallas: Optional[bool] = ...) -> None: ...
    @staticmethod
    def Conversions() -> List[Tuple[PixelFormat, PixelFormat]]: ...
    def Run(self, src: Surface, dst: Surface,
            cc_ctx: Optional[ColorspaceConversionContext] = ...
            ) -> Tuple[bool, TaskExecInfo]: ...
    def RunAsync(self, src: Surface, dst: Surface,
                 cc_ctx: Optional[ColorspaceConversionContext] = ...
                 ) -> Tuple[bool, TaskExecInfo]: ...
    @property
    def Stream(self) -> int: ...

class PySurfaceResizer:
    def __init__(self, format: PixelFormat, gpu_id: int = ...,
                 stream: Optional[int] = ..., method: str = ...,
                 turbo: bool = ..., use_pallas: Optional[bool] = ...) -> None: ...
    def Run(self, src: Surface, dst: Surface) -> Tuple[bool, TaskExecInfo]: ...
    def RunAsync(self, src: Surface, dst: Surface) -> Tuple[bool, TaskExecInfo]: ...
    @property
    def Format(self) -> PixelFormat: ...
    @property
    def Stream(self) -> int: ...

class PySurfaceRotator:
    def __init__(self, gpu_id: int = ..., stream: Optional[int] = ...) -> None: ...
    def Run(self, src: Surface, dst: Surface, angle: float,
            shift_x: float = ..., shift_y: float = ...
            ) -> Tuple[bool, TaskExecInfo]: ...
    def RunAsync(self, src: Surface, dst: Surface, angle: float,
                 shift_x: float = ..., shift_y: float = ...
                 ) -> Tuple[bool, TaskExecInfo]: ...
    @property
    def SupportedFormats(self) -> List[PixelFormat]: ...
    @property
    def Stream(self) -> int: ...

class PySurfaceUD:
    def __init__(self, gpu_id: int = ..., stream: Optional[int] = ...) -> None: ...
    @staticmethod
    def SupportedFormats() -> List[Tuple[PixelFormat, PixelFormat]]: ...
    def Run(self, src: Surface, dst: Surface) -> Tuple[bool, TaskExecInfo]: ...
    def RunAsync(self, src: Surface, dst: Surface) -> Tuple[bool, TaskExecInfo]: ...
    @property
    def Stream(self) -> int: ...

class NvJpegEncodeContext:
    def __init__(self, compression: int, pixel_format: PixelFormat,
                 gpu_id: int = ...) -> None: ...
    def Compression(self) -> int: ...
    def Format(self) -> PixelFormat: ...

class PyNvJpegEncoder:
    def __init__(self, gpu_id: int = ...) -> None: ...
    def Context(self, compression: int,
                pixel_format: PixelFormat) -> NvJpegEncodeContext: ...
    def Run(self, context: NvJpegEncodeContext, surfaces: List[Surface]
            ) -> Tuple[List[numpy.ndarray], TaskExecInfo]: ...

class PyNvEncoder:
    def __init__(self, settings: Dict[str, str], gpu_id: int = ...,
                 stream: Optional[int] = ..., format: PixelFormat = ...,
                 verbose: bool = ...) -> None: ...
    def EncodeSingleSurface(self, surface: Surface, packet: numpy.ndarray,
                            sei: Optional[numpy.ndarray] = ...,
                            sync: bool = ..., append: bool = ...) -> bool: ...
    def EncodeSurface(self, surface: Surface, packet: numpy.ndarray,
                      sei: Optional[numpy.ndarray] = ..., sync: bool = ...,
                      append: bool = ...) -> bool: ...
    def EncodeSingleFrame(self, frame: numpy.ndarray, packet: numpy.ndarray,
                          sei: Optional[numpy.ndarray] = ...,
                          append: bool = ...) -> bool: ...
    def Flush(self, packets: numpy.ndarray) -> bool: ...
    def FlushSinglePacket(self, packets: numpy.ndarray) -> bool: ...
    def Reconfigure(self, settings: Dict[str, str], force_idr: bool = ...,
                    reset_encoder: bool = ..., verbose: bool = ...) -> bool: ...
    @property
    def Capabilities(self) -> Dict[NV_ENC_CAPS, int]: ...
    @property
    def Format(self) -> PixelFormat: ...
    @property
    def FrameSizeInBytes(self) -> int: ...
    def GetFrameSizeInBytes(self) -> int: ...
    @property
    def Width(self) -> int: ...
    @property
    def Height(self) -> int: ...

class PyMuxer:
    """Write encoded H.264/HEVC/VP8/VP9/AV1 access units into
    MP4/MKV/WebM/MPEG-TS.

    Not present in the reference (which emits raw elementary streams
    only); completes the transcode story for this framework."""
    def __init__(self, path: str, width: int, height: int,
                 codec: str = ..., timebase_den: int = ...,
                 format: Optional[str] = ...,
                 fps: Union[float, Tuple[int, int], None] = ...,
                 opts: Optional[dict] = ...) -> None: ...
    def Mux(self, packet, pts: float, dts: Optional[float] = ...,
            key: bool = ...) -> Tuple[bool, TaskExecInfo]: ...
    def Close(self) -> Tuple[bool, TaskExecInfo]: ...
    def __enter__(self) -> "PyMuxer": ...
    def __exit__(self, *exc) -> None: ...

def GetNumGpus() -> int: ...
def num_devices() -> int: ...
def GetNvencParams() -> Dict[str, str]: ...
def SetFFMpegLogLevel(level: FfmpegLogLevel) -> None: ...
