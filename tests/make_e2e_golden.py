"""Regenerate the e2e golden-logits fixtures (tests/data/e2e_golden*.npz).

The reference checks its decode->preprocess->model path against a
committed detections.json produced by pretrained torchvision FCN
(test_TorchSegmentation.py:159-275). This environment has no network to
fetch pretrained weights, so the oracle is: FIXED-seed FCN weights +
decoded frames -> logits, committed once. Any later change in decode,
color conversion, resize, normalization or model numerics shows up as a
diff against these fixtures.

Two fixtures:
- e2e_golden.npz       — reference clip (only written when /root/reference
                         exists; the test that uses it is gated the same way)
- e2e_golden_synth.npz — OUR OWN synthesized clip (chroma="sweep", so
                         R!=G!=B and a channel swap is caught); fully
                         self-contained, no reference checkout needed

Run on the CPU backend (the deterministic test platform):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python3 tests/make_e2e_golden.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GT = "/root/reference/tests/data/test.mp4"
DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")
NORM = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))

# geometry of the synth-clip oracle; the test re-synthesizes with the
# SAME parameters, so keep them in one place
SYNTH_KW = dict(w=320, h=240, n=8, chroma="sweep")


def compute(clip):
    import jax
    import jax.numpy as jnp

    import vali_tpu as vali
    from vali_tpu.memory.host import host_frame_to_planes
    from vali_tpu.models import fcn
    from vali_tpu.ops.fused import fused_preprocess

    dec = vali.PyDecoder(clip, {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    frames = []
    for _ in range(5):
        ok, _ = dec.DecodeSingleFrame(frame)
        assert ok
        frames.append(frame.copy())

    params = fcn.init_params(jax.random.PRNGKey(0))
    logits0 = None
    class_hists = []
    for i, f in enumerate(frames):
        planes = host_frame_to_planes(f, dec.Format, dec.Width, dec.Height)
        rgb = fused_preprocess(
            tuple(jnp.asarray(p)[None] for p in planes), dec.Format,
            dec.Width, dec.Height, 224, 224, vali.ColorSpace.BT_709,
            vali.ColorRange.MPEG, out_dtype=jnp.float32, normalize=NORM)
        logits = np.asarray(fcn.apply(params, rgb), dtype=np.float32)[0]
        if i == 0:
            logits0 = logits
        classes = logits.argmax(-1)
        class_hists.append(np.bincount(classes.reshape(-1), minlength=21))
    return logits0, np.stack(class_hists)


def write(out, logits0, hists):
    np.savez_compressed(out, logits_frame0=logits0.astype(np.float16),
                        class_hists=hists.astype(np.int32))
    print(f"wrote {out}: logits {logits0.shape}, hists {hists.shape}")


if __name__ == "__main__":
    from vali_tpu.utils.synth import synthesize_clip

    with tempfile.TemporaryDirectory() as td:
        clip = synthesize_clip(os.path.join(td, "synth.mp4"), **SYNTH_KW)
        logits0, hists = compute(clip)
    write(os.path.join(DATA, "e2e_golden_synth.npz"), logits0, hists)

    if os.path.exists(GT):
        logits0, hists = compute(GT)
        write(os.path.join(DATA, "e2e_golden.npz"), logits0, hists)
    else:
        print("reference clip absent; skipped e2e_golden.npz")
