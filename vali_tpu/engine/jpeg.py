"""PyNvJpegEncoder: batch JPEG encode on host (libjpeg-turbo).

API parity: reference src/python_vali/src/PyNvJpegEncoder.cpp — a
per-call NvJpegEncodeContext (quality + input format) and batched Run over
a list of Surfaces returning JPEG byte arrays. Thread-safe like the
reference (internal mutex, VALI.hpp:291-305) via the GIL + native encode
with GIL released.
"""

from __future__ import annotations

import threading
from typing import List, Tuple

import numpy as np

from ..core.enums import PixelFormat, TaskExecInfo
from ..memory.host import planes_to_host_frame
from ..memory.surface import Surface
from ._loader import load_native


class NvJpegEncodeContext:
    """Per-call compression settings (parity: NvJpegEncodeContext)."""

    def __init__(self, compression: int, pixel_format: PixelFormat,
                 gpu_id: int = 0):
        self._compression = int(compression)
        self._format = PixelFormat(pixel_format)
        self._native = load_native().JpegEncoder(self._compression,
                                                 int(self._format))

    def Compression(self) -> int:
        return self._compression

    def Format(self) -> PixelFormat:
        return self._format


class PyNvJpegEncoder:
    def __init__(self, gpu_id: int = 0):
        self._gpu_id = gpu_id
        self._lock = threading.Lock()
        load_native()

    def Context(self, compression: int,
                pixel_format: PixelFormat) -> NvJpegEncodeContext:
        return NvJpegEncodeContext(compression, pixel_format, self._gpu_id)

    def Run(self, context: NvJpegEncodeContext,
            surfaces: List[Surface]) -> Tuple[List[np.ndarray], TaskExecInfo]:
        out: List[np.ndarray] = []
        with self._lock:
            for surf in surfaces:
                if surf.IsEmpty or surf.Format != context.Format():
                    return ([], TaskExecInfo.SRC_DST_FMT_MISMATCH
                            if not surf.IsEmpty else TaskExecInfo.FAIL)
                frame = planes_to_host_frame(surf.plane_arrays())
                info, payload = context._native.encode(
                    frame, surf.Width, surf.Height)
                if TaskExecInfo(info) != TaskExecInfo.SUCCESS:
                    return ([], TaskExecInfo(info))
                out.append(np.frombuffer(payload, dtype=np.uint8))
        return (out, TaskExecInfo.SUCCESS)
