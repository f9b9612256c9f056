"""Loader for the native engine extension.

Builds ``vali_tpu._native`` in-place on first import if the prebuilt .so is
missing (the analogue of the reference's scikit-build wheel step). Keeps the
package importable for pure-JAX use even when FFmpeg dev files are absent —
engine classes then raise a clear ImportError at construction.
"""

from __future__ import annotations

import os
import subprocess
import sys
import threading

_native = None
_error: Exception | None = None
_lock = threading.Lock()


def load_native():
    # Fast path without the lock; the build path below must be
    # serialized — two threads racing `setup.py build_ext --inplace`
    # into the same build dir clobber each other's .o/.so files, and
    # the corrupted failure then gets cached in _error forever.
    if _native is not None:
        return _native
    with _lock:
        return _load_native_locked()


def _load_native_locked():
    global _native, _error
    if _native is not None:
        return _native
    if _error is not None:
        raise ImportError(
            f"vali_tpu native engine unavailable: {_error}") from _error
    try:
        from vali_tpu import _native as mod  # type: ignore
        _native = mod
        return _native
    except ImportError:
        pass

    # Try an in-place build (development checkout).
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    setup_py = os.path.join(repo_root, "setup.py")
    if os.path.exists(setup_py):
        try:
            subprocess.run(
                [sys.executable, "setup.py", "build_ext", "--inplace"],
                cwd=repo_root, check=True, capture_output=True, text=True)
            from vali_tpu import _native as mod  # type: ignore
            _native = mod
            return _native
        except (subprocess.CalledProcessError, ImportError) as e:
            _error = e
            detail = ""
            stderr = getattr(e, "stderr", None)
            if stderr:  # surface the actual compiler/linker error
                detail = "\n" + "\n".join(stderr.splitlines()[-15:])
            raise ImportError(
                f"Failed to build vali_tpu native engine: {e}{detail}"
            ) from e
    raise ImportError("vali_tpu._native extension not found")
