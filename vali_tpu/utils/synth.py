"""Self-contained test-clip synthesis (encode + mux with our own stack).

The reference ships golden media under tests/data/ and its tests assume
that checkout exists. This build instead synthesizes clips on demand with
its own encoder + muxer, so the soak test, samples, and the driver's
multichip dryrun all run on a clean machine with no reference checkout
(parity need: reference tests/test_PyDecoder.py fixtures; see
docs/MIGRATING.md "fixtures" note).
"""

from __future__ import annotations

import numpy as np


def synthesize_clip(path: str, w: int = 848, h: int = 464, n: int = 96,
                    fps: float = 30.0) -> str:
    """Encode ``n`` moving-gradient NV12 frames with PyNvEncoder and mux
    them into ``path`` (container inferred from the extension). Returns
    ``path``. The clip decodes back bit-exactly through PyDecoder in
    tests/test_fidelity.py's round-trip harness.

    Deliberately JAX-free (host-frame encode, no Surface round trip):
    bench.py synthesizes clips BEFORE its device probe, and during an
    axon tunnel outage any jax.devices() call blocks forever."""
    import vali_tpu as vali

    enc = vali.PyNvEncoder({"s": f"{w}x{h}", "bf": "0", "lookahead": "0",
                            "gop": "30", "fps": str(int(fps))},
                           gpu_id=0, format=vali.PixelFormat.NV12)
    pkts = []
    pkt = np.zeros(0, np.uint8)
    grad = np.linspace(16, 235, w, dtype=np.float64)
    for i in range(n):
        y = np.clip(grad[None, :] + i, 16, 235).astype(np.uint8)
        y = np.broadcast_to(y, (h, w))
        uv = np.full((h // 2, w), 128, np.uint8)
        frame = np.concatenate([y.reshape(-1), uv.reshape(-1)])
        if enc.EncodeSingleFrame(frame, pkt):
            pkts.append(pkt.tobytes())
    while True:
        f = np.zeros(0, np.uint8)
        if not enc.FlushSinglePacket(f) or not f.size:
            break
        pkts.append(f.tobytes())
    assert len(pkts) == n

    from vali_tpu.engine.muxer import PyMuxer

    with PyMuxer(path, w, h, fps=fps) as mux:
        for i, d in enumerate(pkts):
            assert mux.Mux(d, pts=i / fps)[0]
    return path
