"""PyDecoder: FFmpeg demux+decode feeding host frames or TPU surfaces.

API parity: reference src/python_vali/src/PyDecoder.cpp (701 lines of
pybind11 bindings). Construction with ``gpu_id=-1`` gives the host path
(``DecodeSingleFrame`` into numpy); ``gpu_id>=0`` gives the device path
(``DecodeSingleSurface`` into a Surface whose planes live in TPU HBM).
Decode itself always runs on host CPU — there is no video codec ASIC on
TPU — with the GIL released inside the native engine, so N decoder
instances scale across threads (the reference's multi-instance pattern).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.details import (
    MOTION_VECTOR_DTYPE,
    PacketData,
    SeekContext,
    StreamParams,
)
from ..core.enums import (
    ColorRange,
    ColorSpace,
    DecodeMode,
    FfmpegLogLevel,
    PixelFormat,
    SeekMode,
    TaskExecInfo,
)
from ..memory.host import host_frame_to_planes
from ..memory.surface import Surface
from ..utils.device import get_device, get_stream
from ._loader import load_native
from ._opts import opt_str


def SetFFMpegLogLevel(level: FfmpegLogLevel) -> None:
    """Parity: reference VALI.cpp:512-521."""
    load_native().set_ffmpeg_log_level(int(level))


def _copy_frame_error(written: int) -> TaskExecInfo:
    """Map a native CopyFrame error code to the TaskExecInfo taxonomy.

    ERR_UNREPRESENTABLE_LAYOUT (exported by the native module from
    decoder.hpp's kErrUnrepresentableLayout — one source of truth) means
    the frame layout cannot be expressed in the advertised PixFmt, e.g.
    odd-dimension yuv420p12 vs semi-planar P012.
    """
    if written == load_native().ERR_UNREPRESENTABLE_LAYOUT:
        return TaskExecInfo.UNSUPPORTED_FMT_CONV_PARAMS
    return TaskExecInfo.FAIL


class BufferedReader:
    """Thin adapter marking an object as a custom-IO source.

    Any object with ``.read(n)`` (and optionally ``.seek``) can be passed to
    PyDecoder directly; this class exists for API discoverability.
    """

    def __init__(self, obj):
        if not hasattr(obj, "read"):
            raise TypeError("BufferedReader requires an object with .read")
        self.obj = obj


class PyDecoder:
    """Video decoder (parity: reference PyDecoder)."""

    def __init__(self, input, opts: Optional[dict] = None, gpu_id: int = 0,
                 **kwargs):
        if opts is None:
            opts = {}
        opts = {opt_str(k): opt_str(v) for k, v in opts.items()}
        native = load_native()
        self._gpu_id = gpu_id
        self._device = get_device(gpu_id) if gpu_id >= 0 else None
        self._stream = get_stream(None)
        if isinstance(input, BufferedReader):
            input = input.obj
        if isinstance(input, (str, bytes)):
            url = input if isinstance(input, str) else input.decode()
            self._dec = native.Decoder(url, opts, None, False)
        else:
            if not hasattr(input, "read"):
                raise TypeError(
                    "input must be a URL string or an object with .read")
            self._dec = native.Decoder(None, opts, input, False)

    # --- decode ------------------------------------------------------------

    def _do_decode(self, seek_ctx: Optional[SeekContext]):
        if seek_ctx is not None:
            by_number = seek_ctx.mode == SeekMode.BY_FRAME
            return self._dec.seek(
                seek_ctx.seek_frame, seek_ctx.seek_tssec, int(by_number))
        return self._dec.decode()

    def _fill_pkt_data(self, pkt_data: Optional[PacketData]):
        if pkt_data is None:
            return
        d = self._dec.packet_data()
        pkt_data.pts = d["pts"]
        pkt_data.dts = d["dts"]
        pkt_data.pos = d["pos"]
        pkt_data.bsl = d["bsl"]
        pkt_data.duration = d["duration"]
        pkt_data.key = d["key"]

    def DecodeSingleFrame(
        self, frame: np.ndarray, pkt_data: Optional[PacketData] = None,
        seek_ctx: Optional[SeekContext] = None,
    ) -> Tuple[bool, TaskExecInfo]:
        """Decode into a host numpy array (gpu_id == -1 path only,
        parity: PyDecoder.cpp:77-95)."""
        if isinstance(pkt_data, SeekContext) and seek_ctx is None:
            pkt_data, seek_ctx = None, pkt_data
        if self._gpu_id >= 0:
            # parity: the reference returns (False, FAIL) on the
            # accelerated-path mismatch (PyDecoder.cpp:80-84), it does
            # not raise
            return (False, TaskExecInfo.FAIL)
        info_val, msg = self._do_decode(seek_ctx)
        info = TaskExecInfo(info_val)
        if info == TaskExecInfo.RES_CHANGE:
            # No pixels delivered with the event; the caller re-allocates
            # and the next call returns the stashed frame (parity:
            # test_resolution_change_cpu semantics).
            return (True, info)
        if info != TaskExecInfo.SUCCESS:
            return (False, info)
        size = self.HostFrameSize
        if frame.nbytes != size:
            try:
                # ceil, not floor: a frame size not divisible by the
                # caller's dtype itemsize must never truncate the buffer
                elems = -(-size // frame.dtype.itemsize)
                frame.resize((elems,), refcheck=False)
            except ValueError:  # array does not own its data
                return (False, TaskExecInfo.INVALID_INPUT)
        written = self._dec.copy_frame(frame)
        if written < 0:
            return (False, _copy_frame_error(written))
        self._fill_pkt_data(pkt_data)
        return (True, info)

    def _decode_surface(self, surf: Surface, pkt_data, seek_ctx, sync):
        if self._gpu_id < 0:
            # parity: (False, FAIL), not an exception (PyDecoder.cpp:100)
            return (False, TaskExecInfo.FAIL)
        if surf is None or surf.IsEmpty:
            return (False, TaskExecInfo.INVALID_INPUT)
        # Validate the destination BEFORE decoding (parity:
        # PyDecoder.cpp:105-121): rejecting after _do_decode would
        # consume and irreversibly drop a decoded frame per failed call.
        p = self._props()
        width, height = p["width"], p["height"]
        fmt = PixelFormat(p["format"])
        if (surf.Width != width or surf.Height != height
                or surf.Format != fmt):
            return (False, TaskExecInfo.SRC_DST_FMT_MISMATCH
                    if surf.Format != fmt
                    else TaskExecInfo.SRC_DST_SIZE_MISMATCH)
        info_val, msg = self._do_decode(seek_ctx)
        info = TaskExecInfo(info_val)
        if info == TaskExecInfo.RES_CHANGE:
            # Stash protocol: caller re-allocates, next call delivers
            # (parity: TaskDecodeFrame.cpp:1043-1054).
            return (True, info)
        if info != TaskExecInfo.SUCCESS:
            return (False, info)
        # a RES_CHANGE may have updated the props since the pre-check
        p = self._props()
        width, height = p["width"], p["height"]
        fmt = PixelFormat(p["format"])
        size = p["host_frame_size"]
        # FRESH staging buffer per decode — never reused. device_put can
        # zero-copy ALIAS host memory on CPU-family backends (observed on
        # the forced-8-device host platform with an explicit device arg,
        # even for multi-MB planes), so a reused buffer silently
        # corrupted every previously returned surface, sync or async.
        # Ownership transfers instead: the device arrays keep the buffer
        # alive, and nothing ever writes it again.
        stage = np.empty(size, dtype=np.uint8)
        written = self._dec.copy_frame(stage)
        if written < 0:
            return (False, _copy_frame_error(written))
        planes = host_frame_to_planes(stage, fmt, width, height)
        import jax

        arrays = [jax.device_put(p, self._device) for p in planes]
        surf._replace_arrays(arrays)
        self._stream.record_arrays(arrays)
        if sync:
            surf.block_until_ready()
        self._fill_pkt_data(pkt_data)
        return (True, info)

    def DecodeSingleSurface(self, surf, pkt_data=None, seek_ctx=None):
        """Decode the next frame into ``surf`` on the device, synchronously (parity: PyDecoder.cpp:97-123; sync variant records+waits the stream event)."""
        if isinstance(pkt_data, SeekContext) and seek_ctx is None:
            pkt_data, seek_ctx = None, pkt_data
        return self._decode_surface(surf, pkt_data, seek_ctx, sync=True)

    def DecodeSingleSurfaceAsync(self, surf, pkt_data=None, seek_ctx=None):
        """Decode the next frame into ``surf`` without waiting for device completion (parity: PyDecoder.cpp RunAsync variants)."""
        if isinstance(pkt_data, SeekContext) and seek_ctx is None:
            pkt_data, seek_ctx = None, pkt_data
        return self._decode_surface(surf, pkt_data, seek_ctx, sync=False)

    # --- probe -------------------------------------------------------------

    @staticmethod
    def Probe(input: str) -> List[StreamParams]:
        """Parity: reference PyDecoder.cpp:684-698."""
        native = load_native()
        dec = native.Decoder(input, {}, None, True)
        out = []
        props = dec.props()
        for i in range(props["num_streams"]):
            p = dec.stream_params(i)
            if p is None:
                continue
            out.append(StreamParams(
                width=p["width"], height=p["height"], fourcc=p["fourcc"],
                codec_id=p["codec_id"], fps=p["fps"], avg_fps=p["avg_fps"],
                time_base=p["time_base"], start_time=p["start_time"],
                start_time_sec=p["start_time_sec"],
                duration_sec=p["duration_sec"], bit_rate=p["bit_rate"],
                num_frames=p["num_frames"], profile=p["profile"],
                level=p["level"],
                color_space=ColorSpace(p["color_space"]),
                color_range=ColorRange(p["color_range"])))
        return out

    # --- properties --------------------------------------------------------

    def _props(self):
        return self._dec.props()

    @property
    def Width(self) -> int:
        """Coded frame width in pixels."""
        return self._props()["width"]

    @property
    def Height(self) -> int:
        """Coded frame height in pixels."""
        return self._props()["height"]

    @property
    def Level(self) -> int:
        """Codec level of the input stream."""
        return self._props()["level"]

    @property
    def Profile(self) -> int:
        """Codec profile of the input stream."""
        return self._props()["profile"]

    @property
    def Delay(self) -> int:
        """Decoder reordering delay in frames."""
        return self._props()["delay"]

    @property
    def GopSize(self) -> int:
        """GOP size from the codec context (like the reference: the
        libavcodec decode-side default when the stream does not say)."""
        return self._props()["gop_size"]

    @property
    def Bitrate(self) -> int:
        """Stream bitrate in bits per second."""
        return self._props()["bitrate"]

    @property
    def NumFrames(self) -> int:
        """Number of frames in the stream (0 when the container does not say)."""
        return self._props()["num_frames"]

    @property
    def NumStreams(self) -> int:
        """Number of streams in the container."""
        return self._props()["num_streams"]

    @property
    def StreamIndex(self) -> int:
        """Index of the selected video stream."""
        return self._props()["stream_index"]

    @property
    def HostFrameSize(self) -> int:
        """Size in bytes of one decoded host frame."""
        return self._props()["host_frame_size"]

    @property
    def Framerate(self) -> float:
        """Declared frame rate (r_frame_rate)."""
        return self._props()["framerate"]

    @property
    def AvgFramerate(self) -> float:
        """Average frame rate (avg_frame_rate)."""
        return self._props()["avg_framerate"]

    @property
    def Timebase(self) -> float:
        """Stream time base in seconds per tick."""
        return self._props()["timebase"]

    @property
    def StartTime(self) -> float:
        """Stream start time in seconds."""
        return self._props()["start_time"]

    @property
    def Duration(self) -> float:
        """Stream duration in TRUE seconds.

        Intentional deviation: the reference divides stream-timebase
        units by AV_TIME_BASE (TaskDecodeFrame.cpp GetStreamParams),
        which only equals seconds when the timebase happens to be
        1/1000000; this build multiplies by the actual timebase
        (src/native/decoder.cpp Duration()). See docs/MIGRATING.md
        "Intentional behavioral deviations"."""
        return self._props()["duration"]

    @property
    def ColorSpace(self) -> ColorSpace:
        """Color space of the decoded frames (BT_601/BT_709/UNSPEC)."""
        return ColorSpace(self._props()["color_space"])

    @property
    def ColorRange(self) -> ColorRange:
        """Color range of the decoded frames (MPEG/JPEG/UDEF)."""
        return ColorRange(self._props()["color_range"])

    @property
    def Format(self) -> PixelFormat:
        """Pixel format of the decoded frames."""
        return PixelFormat(self._props()["format"])

    @property
    def IsVFR(self) -> bool:
        """True when the stream is variable frame rate (r_frame_rate != avg_frame_rate)."""
        return self._props()["is_vfr"]

    @property
    def IsAccelerated(self) -> bool:
        """Always False: decode runs on host CPU; device work is the
        transform pipeline (see SURVEY.md architecture mapping)."""
        return False

    @property
    def Stream(self) -> int:
        """Stream handle associated with this decoder (device queue id)."""
        return self._stream.handle

    @property
    def Mode(self) -> DecodeMode:
        """Current decode mode (ALL_FRAMES or KEY_FRAMES)."""
        return DecodeMode(self._props()["mode"])

    def SetMode(self, mode: DecodeMode) -> None:
        """Switch between ALL_FRAMES and KEY_FRAMES decode modes."""
        self._dec.set_mode(int(mode))

    @property
    def Metadata(self) -> dict:
        """Container and stream metadata as nested dicts."""
        return self._dec.metadata()

    @property
    def MotionVectors(self) -> "np.ndarray":
        """Motion vectors of the last decoded frame (requires
        flags2=+export_mvs) as a structured numpy array with dtype
        ``MOTION_VECTOR_DTYPE`` (parity: the reference registers a numpy
        dtype and returns a vectorized array, VALI.cpp:125-128). Fields
        are readable by name: ``mvs["motion_x"]`` etc. The array is
        writable (the reference's is) — wrap the immutable native bytes
        in a bytearray the array owns, else in-place user math like
        ``mvs["motion_x"] //= mvs["motion_scale"]`` raises ValueError."""
        buf = self._dec.motion_vectors_packed()
        return np.frombuffer(bytearray(buf), dtype=MOTION_VECTOR_DTYPE)

    @property
    def DisplayRotation(self) -> float:
        """Display rotation angle in degrees from the stream/frame display matrix."""
        return self._dec.display_rotation()

    @property
    def Stats(self) -> dict:
        """Internal pipeline counters (parity: the reference's debug
        counters m_num_pkt_read/sent/frm_recv, TaskDecodeFrame.cpp:150)."""
        p = self._props()
        return {k: p[k] for k in ("num_pkt_read", "num_pkt_sent",
                                  "num_frm_recv")}
