"""Tracing scopes.

TPU-native analogue of the reference's NVTX ranges (``NvtxMark`` RAII in
every task Run(), reference src/TC/inc/Tasks.hpp:32-59, compile-time gated
by USE_NVTX): every op body runs inside a ``jax.profiler.TraceAnnotation``
+ ``jax.named_scope`` so it shows up in TPU profiler traces / Perfetto.
Runtime-gated by env ``VALI_TPU_TRACE=0`` (default on — the annotation is
cheap) mirroring the reference's macro-guard pattern.
"""

from __future__ import annotations

import contextlib
import os

_enabled = os.environ.get("VALI_TPU_TRACE", "1") not in ("0", "")


def enable(on: bool = True) -> None:
    global _enabled
    _enabled = bool(on)


@contextlib.contextmanager
def op_scope(name: str):
    if not _enabled:
        yield
        return
    import jax

    with jax.profiler.TraceAnnotation(f"vali::{name}"):
        with jax.named_scope(name):
            yield
