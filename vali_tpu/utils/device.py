"""Device registry and async-completion primitives.

The reference manages GPUs through a singleton primary-context + stream cache
(``CudaResMgr``, reference src/TC/src/CudaUtils.cpp:185-299) and exposes CUDA
events to Python (``CudaStreamEvent``, VALI.cpp:281-314). On TPU the XLA
runtime owns the device, so this module shrinks to:

  - ``get_device(gpu_id)``: ``gpu_id`` -> ``jax.Device`` (index into
    ``jax.devices()``; -1 means "host/CPU path").
  - ``Stream``: a ledger of in-flight ``jax.Array`` results. JAX dispatch is
    asynchronous by construction; an op's "RunAsync" enqueues work and records
    its outputs on the stream ledger, and ``CudaStreamEvent.Record()/Wait()``
    maps to snapshotting the ledger and ``block_until_ready`` — the exact
    semantic of cuEventRecord/cuEventSynchronize for this framework's use.

User-supplied integer stream handles (the reference accepts raw ``size_t``
CUDA streams) map to named ledgers so pipelines composed around distinct
streams keep distinct completion domains.
"""

from __future__ import annotations

import threading
import weakref
from typing import Dict, List, Optional

import jax


def num_devices() -> int:
    """Number of accelerator devices (reference ``GetNumGpus``)."""
    try:
        return len(jax.devices())
    except RuntimeError:
        return 0


def pallas_platform_available() -> bool:
    """True when the default backend can run the compiled Pallas TPU
    (Mosaic) kernels. Single source of truth for the op-level
    Pallas-vs-XLA routing in csc/resize/multistream. Strictly
    ``platform == "tpu"`` (the axon tunnel reports "tpu" too): on a
    GPU/METAL backend the pltpu kernels would fail at compile time, so
    any non-TPU accelerator must take the XLA path."""
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def get_device(gpu_id: int) -> "jax.Device":
    """Map a VALI-style gpu_id onto a jax.Device."""
    devices = jax.devices()
    if gpu_id < 0 or gpu_id >= len(devices):
        raise RuntimeError(
            f"Invalid device id {gpu_id}; have {len(devices)} device(s)")
    return devices[gpu_id]


class Stream:
    """A completion domain: tracks arrays dispatched through it."""

    __slots__ = ("handle", "_lock", "_pending")

    def __init__(self, handle: int):
        self.handle = handle
        self._lock = threading.Lock()
        self._pending: List[weakref.ref] = []

    def record_arrays(self, arrays) -> None:
        with self._lock:
            self._pending = [r for r in self._pending if r() is not None]
            for a in arrays:
                try:
                    self._pending.append(weakref.ref(a))
                except TypeError:
                    pass  # plain numpy etc. — already complete

    def snapshot(self) -> List:
        with self._lock:
            return [a for a in (r() for r in self._pending) if a is not None]

    def synchronize(self) -> None:
        for a in self.snapshot():
            a.block_until_ready()


_streams: Dict[int, Stream] = {}
_streams_lock = threading.Lock()
_next_handle = [1]


def get_stream(handle: Optional[int] = None) -> Stream:
    """Fetch (or create) the ledger for a stream handle; None = default."""
    key = 0 if handle is None else int(handle)
    with _streams_lock:
        st = _streams.get(key)
        if st is None:
            st = Stream(key)
            _streams[key] = st
        return st


def new_stream() -> Stream:
    with _streams_lock:
        handle = _next_handle[0]
        _next_handle[0] += 1
        st = Stream(handle)
        _streams[handle] = st
        return st


class CudaStreamEvent:
    """Event over a stream ledger (API parity: reference VALI.cpp:281-314).

    ``Record()`` snapshots the arrays currently in flight on the stream;
    ``Wait()`` blocks until that snapshot has materialized on device.
    """

    def __init__(self, stream: int = 0, gpu_id: int = 0):
        self._stream = get_stream(stream)
        self._gpu_id = gpu_id
        self._snapshot: List = []

    def Record(self) -> None:
        """Record the arrays currently enqueued on the stream (parity: CudaStreamEvent Record)."""
        self._snapshot = self._stream.snapshot()

    def Wait(self) -> None:
        """Block until every recorded array is ready (parity: CudaStreamEvent Wait)."""
        for a in self._snapshot:
            a.block_until_ready()
        self._snapshot = []
