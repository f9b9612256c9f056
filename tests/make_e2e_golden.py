"""Regenerate the e2e golden-logits fixture (tests/data/e2e_golden.npz).

The reference checks its decode->preprocess->model path against a
committed detections.json produced by pretrained torchvision FCN
(test_TorchSegmentation.py:159-275). This environment has no network to
fetch pretrained weights, so the oracle is: FIXED-seed FCN weights +
frame 0 of the reference clip -> logits, committed once. Any later
change in decode, color conversion, resize, normalization or model
numerics shows up as a diff against this fixture.

Run on the CPU backend (the deterministic test platform):

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python3 tests/make_e2e_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GT = "/root/reference/tests/data/test.mp4"
OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data",
                   "e2e_golden.npz")
NORM = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))


def compute():
    import jax
    import jax.numpy as jnp

    import vali_tpu as vali
    from vali_tpu.memory.host import host_frame_to_planes
    from vali_tpu.models import fcn
    from vali_tpu.ops.fused import fused_preprocess

    dec = vali.PyDecoder(GT, {}, gpu_id=-1)
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


if __name__ == "__main__":
    logits0, hists = compute()
    np.savez_compressed(OUT, logits_frame0=logits0.astype(np.float16),
                        class_hists=hists.astype(np.int32))
    print(f"wrote {OUT}: logits {logits0.shape}, hists {hists.shape}")
