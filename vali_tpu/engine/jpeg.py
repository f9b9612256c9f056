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
        """Create an encode context carrying compression quality and input format (parity: PyNvJpegEncoder.cpp Context)."""
        return NvJpegEncodeContext(compression, pixel_format, self._gpu_id)

    def Run(self, context: NvJpegEncodeContext,
            surfaces: List[Surface]) -> Tuple[List[np.ndarray], TaskExecInfo]:
        """Encode a batch of surfaces to JPEG bytes; returns ([arrays], TaskExecInfo) (parity: PyNvJpegEncoder.cpp:135-160)."""
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
                out.append(np.frombuffer(bytearray(payload), dtype=np.uint8))
        return (out, TaskExecInfo.SUCCESS)


def jpeg_encode_device(surfaces, quality: int = 85,
                       subsample420=None):
    """TPU-assisted batch JPEG encode (SURVEY §7 stretch goal).

    The device runs color conversion, chroma subsampling, 8x8 DCT and
    quantization for the WHOLE batch in one fused XLA computation
    (ops/jpeg.py); the host only entropy-codes the quantized coefficients
    via libjpeg's jpeg_write_coefficients. Accepts RGB/BGR/RGB_PLANAR/Y/
    YUV444/YUV420 surfaces of equal geometry; returns a list of numpy JPEG
    byte arrays. ``subsample420=None`` picks the format's natural
    subsampling (4:2:0 except for YUV444). An explicit bool overrides it
    where physically possible: YUV420 input is already subsampled, so
    ``subsample420=False`` with YUV420 surfaces raises (4:4:4 output
    cannot be reconstructed), and the flag is ignored for grayscale.
    """
    import jax.numpy as jnp

    from ..ops.jpeg import jpeg_transform_batch

    if not surfaces:
        return []
    native = load_native()
    fmt = surfaces[0].Format
    w, h = surfaces[0].Width, surfaces[0].Height
    for s in surfaces:
        if s.Format != fmt or s.Width != w or s.Height != h:
            raise ValueError("All surfaces must share format and geometry")

    n_planes = len(surfaces[0].plane_arrays())
    batched = tuple(
        jnp.stack([s.plane_arrays()[j] for s in surfaces])
        for j in range(n_planes))
    if subsample420 is None:
        is420 = fmt != PixelFormat.YUV444
    else:
        if not subsample420 and fmt == PixelFormat.YUV420:
            raise ValueError(
                "subsample420=False is impossible for YUV420 input: the "
                "chroma is already 4:2:0-subsampled")
        is420 = bool(subsample420) or fmt == PixelFormat.YUV420
    y_c, cb_c, cr_c = jpeg_transform_batch(
        batched, src_fmt=int(fmt), width=w, height=h, quality=quality,
        subsample420=is420)

    y_np = np.asarray(y_c)
    cb_np = np.asarray(cb_c) if cb_c is not None else None
    cr_np = np.asarray(cr_c) if cr_c is not None else None

    out = []
    for i in range(y_np.shape[0]):
        kwargs = dict(width=w, height=h, subsample420=is420,
                      quality=quality, y_bh=y_np.shape[1],
                      y_bw=y_np.shape[2])
        if cb_np is not None:
            kwargs.update(c_bh=cb_np.shape[1], c_bw=cb_np.shape[2])
            info, payload = native.encode_jpeg_coefficients(
                np.ascontiguousarray(y_np[i]),
                np.ascontiguousarray(cb_np[i]),
                np.ascontiguousarray(cr_np[i]), **kwargs)
        else:
            info, payload = native.encode_jpeg_coefficients(
                np.ascontiguousarray(y_np[i]), None, None, **kwargs)
        if TaskExecInfo(info) != TaskExecInfo.SUCCESS:
            raise RuntimeError(f"JPEG entropy coding failed: {payload}")
        out.append(np.frombuffer(bytearray(payload), dtype=np.uint8))
    return out
