"""PyNvEncoder: VALI-compatible encoder over libx264/libx265.

API parity: reference src/python_vali/src/PyNvEncoder.cpp — the 30-key
NVENC option dict (validated, discoverable via GetNvencParams), lazy
construction, EncodeSurface with SEI/sync/append, Flush/FlushSinglePacket,
Reconfigure, Capabilities. The NVENC ASIC becomes host x264/x265; surface
planes are downloaded from HBM and fed to the codec with the GIL released.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..core.enums import NV_ENC_CAPS, PixelFormat, TaskExecInfo
from ..memory.host import planes_to_host_frame
from ..memory.surface import Surface
from ._loader import load_native
from ._opts import opt_str


def GetNvencParams() -> Dict[str, str]:
    """Documented encoder option keys (parity: VALI.cpp:505-510)."""
    return dict(load_native().encoder_option_docs())


def _append_packet(packet: np.ndarray, data: bytes, append: bool) -> None:
    """Write encoded bytes into the caller's numpy array, optionally
    appending (parity: PyNvEncoder.cpp:246-256)."""
    arr = np.frombuffer(data, dtype=np.uint8)
    if append and packet.size:
        # ndarray.resize preserves leading contents in place — no copy of
        # the existing bytes needed
        n = packet.size
        packet.resize((n + arr.size,), refcheck=False)
        packet[n:] = arr
    else:
        packet.resize((arr.size,), refcheck=False)
        packet[:] = arr


class PyNvEncoder:
    """Video encoder with the reference's option-dict interface."""

    def __init__(self, settings: Dict[str, str], gpu_id: int = 0,
                 stream: Optional[int] = None,
                 format: PixelFormat = PixelFormat.NV12,
                 verbose: bool = False):
        native = load_native()
        self._settings = {opt_str(k): opt_str(v) for k, v in settings.items()}
        self._format = PixelFormat(format)
        self._gpu_id = gpu_id
        self._verbose = verbose
        self._enc = native.Encoder(self._settings, int(self._format),
                                   bool(verbose))

    @property
    def Width(self) -> int:
        """Encoded frame width in pixels."""
        return self._enc.props()["width"]

    @property
    def Height(self) -> int:
        """Encoded frame height in pixels."""
        return self._enc.props()["height"]

    @property
    def Format(self) -> PixelFormat:
        """Input pixel format the encoder expects."""
        return PixelFormat(self._enc.props()["format"])

    @property
    def FrameSizeInBytes(self) -> int:
        """Size in bytes of one input frame."""
        return self._enc.props()["frame_size"]

    def GetFrameSizeInBytes(self) -> int:
        """Size in bytes of one input frame in the encoder's pixel format."""
        return self.FrameSizeInBytes

    @property
    def Capabilities(self) -> Dict[NV_ENC_CAPS, int]:
        """Synthesized capability table for the active software codec."""
        hevc = self._enc.props()["is_hevc"]
        caps = {c: 0 for c in NV_ENC_CAPS}
        caps.update({
            NV_ENC_CAPS.NUM_MAX_BFRAMES: 16,
            NV_ENC_CAPS.SUPPORTED_RATECONTROL_MODES: 0x3F,
            NV_ENC_CAPS.SUPPORT_QPELMV: 1,
            NV_ENC_CAPS.SUPPORT_BDIRECT_MODE: 1,
            NV_ENC_CAPS.SUPPORT_CABAC: 1,
            NV_ENC_CAPS.SUPPORT_ADAPTIVE_TRANSFORM: 1,
            NV_ENC_CAPS.WIDTH_MAX: 8192,
            NV_ENC_CAPS.HEIGHT_MAX: 8192,
            NV_ENC_CAPS.WIDTH_MIN: 32,
            NV_ENC_CAPS.HEIGHT_MIN: 32,
            NV_ENC_CAPS.SUPPORT_DYN_BITRATE_CHANGE: 1,
            NV_ENC_CAPS.SUPPORT_DYN_RES_CHANGE: 1,
            NV_ENC_CAPS.SUPPORT_CUSTOM_VBV_BUF_SIZE: 1,
            NV_ENC_CAPS.SUPPORT_INTRA_REFRESH: 1,
            NV_ENC_CAPS.SUPPORT_LOOKAHEAD: 1,
            NV_ENC_CAPS.SUPPORT_TEMPORAL_AQ: 1,
            NV_ENC_CAPS.SUPPORT_LOSSLESS_ENCODE: 1,
            NV_ENC_CAPS.SUPPORT_10BIT_ENCODE: 1,
            NV_ENC_CAPS.SUPPORT_YUV444_ENCODE: 0 if hevc else 1,
            NV_ENC_CAPS.SUPPORT_SAO: 1 if hevc else 0,
            NV_ENC_CAPS.SUPPORT_MULTIPLE_REF_FRAMES: 1,
            NV_ENC_CAPS.MB_NUM_MAX: 65536,
            NV_ENC_CAPS.MB_PER_SEC_MAX: 983040,
        })
        return caps

    # --- encode ------------------------------------------------------------

    def _encode_host_frame(self, frame: np.ndarray, packet: np.ndarray,
                           sei: Optional[np.ndarray],
                           append: bool) -> bool:
        sei_buf = None
        if sei is not None and getattr(sei, "size", 0):
            sei_buf = np.ascontiguousarray(sei).reshape(-1).view(np.uint8)
        info, msg = self._enc.encode(frame, False, sei_buf)
        if TaskExecInfo(info) != TaskExecInfo.SUCCESS:
            return False
        data = self._enc.pop_packet()
        if data is None:
            # No packet available yet (codec still filling its
            # lookahead/B-frame pipeline). The reference returns False in
            # this case (PyNvEncoder.cpp:260) — packet bytes arrive on a
            # later call once the frame-delay queue fills. sync=True is
            # best-effort here: libavcodec cannot drain a single frame
            # mid-stream without ending it, so the delay queue behaves
            # like NVENC's async frame queue either way.
            if not append:
                _append_packet(packet, b"", False)
            return False
        _append_packet(packet, data, append)
        return True

    def _encode_impl(self, surface: Optional[Surface], packet: np.ndarray,
                     sei: Optional[np.ndarray], sync: bool,
                     append: bool) -> bool:
        if surface is None or surface.IsEmpty:
            return self.FlushSinglePacket(packet)
        if (surface.Width != self.Width or surface.Height != self.Height
                or surface.Format != self._format):
            raise RuntimeError(
                "Surface does not match encoder size/format")
        frame = planes_to_host_frame(surface.plane_arrays())
        return self._encode_host_frame(frame, packet, sei, append)

    def EncodeSingleSurface(self, surface, packet: np.ndarray,
                            sei: Optional[np.ndarray] = None,
                            sync: bool = False,
                            append: bool = False) -> bool:
        """Encode one surface; returns True iff an encoded packet was written into ``packet`` (False while the codec's frame-delay queue fills; parity: PyNvEncoder.cpp:177-261)."""
        return self._encode_impl(surface, packet, sei, sync, append)

    # The reference exposes the same entry point under both names.
    EncodeSurface = EncodeSingleSurface

    def EncodeSingleFrame(self, frame: np.ndarray, packet: np.ndarray,
                          sei: Optional[np.ndarray] = None,
                          append: bool = False) -> bool:
        """Encode one HOST frame (beyond reference).

        Same packet contract as EncodeSingleSurface, but the input is a
        flat host frame in the encoder's pixel format — the exact layout
        ``PyDecoder.DecodeSingleFrame`` produces. Host-side pipelines
        (``gpu_id=-1`` decode -> encode) skip the Surface upload/download
        round trip entirely — through a tunneled device that is two RPCs
        per frame — and the clip synthesizer stays JAX-free, so it can
        run before any device runtime is touched.
        """
        flat = np.ascontiguousarray(frame).reshape(-1).view(np.uint8)
        if flat.nbytes != self.FrameSizeInBytes:
            raise RuntimeError(
                f"Frame has {flat.nbytes} bytes, encoder expects "
                f"{self.FrameSizeInBytes}")
        return self._encode_host_frame(flat, packet, sei, append)

    def FlushSinglePacket(self, packet: np.ndarray) -> bool:
        """Retrieve one buffered packet after EOS; False when drained (parity: PyNvEncoder.cpp:263-281)."""
        info, msg = self._enc.flush()
        if TaskExecInfo(info) != TaskExecInfo.SUCCESS:
            return False
        data = self._enc.pop_packet()
        if data is None:
            _append_packet(packet, b"", False)
            return False
        _append_packet(packet, data, False)
        return True

    def Flush(self, packets: np.ndarray) -> bool:
        """Drain all remaining packets, concatenated (parity:
        PyNvEncoder.cpp:263-281)."""
        info, msg = self._enc.flush()
        if TaskExecInfo(info) != TaskExecInfo.SUCCESS:
            return False
        chunks = []
        while True:
            data = self._enc.pop_packet()
            if data is None:
                break
            chunks.append(data)
        if not chunks:
            _append_packet(packets, b"", False)
            return False
        _append_packet(packets, b"".join(chunks), False)
        return True

    def Reconfigure(self, settings: Dict[str, str], force_idr: bool = False,
                    reset_encoder: bool = False,
                    verbose: bool = False) -> bool:
        """Merge new options and re-tune the encoder; resolution changes require reset_encoder=True (parity: PyNvEncoder.cpp:88-103)."""
        info, msg = self._enc.reconfigure(
            {opt_str(k): opt_str(v) for k, v in settings.items()},
            bool(force_idr), bool(reset_encoder))
        return TaskExecInfo(info) == TaskExecInfo.SUCCESS
