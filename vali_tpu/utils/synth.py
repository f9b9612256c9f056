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
                    fps: float = 30.0, chroma: str = "flat") -> str:
    """Encode ``n`` moving-gradient NV12 frames with PyNvEncoder and mux
    them into ``path`` (container inferred from the extension). Returns
    ``path``. The clip decodes back bit-exactly through PyDecoder in
    tests/test_fidelity.py's round-trip harness.

    chroma="flat" (default): U=V=128, a grayscale ramp — cheap to encode,
    used by soak/bench/samples/dryrun. chroma="sweep": U ramps vertically
    and V horizontally (16..240), so decoded R!=G!=B almost everywhere —
    required by the e2e golden oracle, where a flat-chroma clip would let
    an RGB<->BGR channel swap pass unnoticed (R=G=B when U=V=128).

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
    if chroma == "sweep":
        u_col = np.linspace(16, 240, h // 2, dtype=np.float64)
        v_row = np.linspace(16, 240, w // 2, dtype=np.float64)
        uv_sweep = np.empty((h // 2, w), np.uint8)
        uv_sweep[:, 0::2] = u_col[:, None].astype(np.uint8)
        uv_sweep[:, 1::2] = v_row[None, :].astype(np.uint8)
    elif chroma != "flat":
        raise ValueError(f"chroma must be 'flat' or 'sweep', got {chroma!r}")
    for i in range(n):
        y = np.clip(grad[None, :] + i, 16, 235).astype(np.uint8)
        y = np.broadcast_to(y, (h, w))
        uv = (uv_sweep if chroma == "sweep"
              else np.full((h // 2, w), 128, np.uint8))
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
