"""End-to-end ML integration test.

Parity target: reference tests/test_TorchSegmentation.py:159-275
(decode -> convert -> resize -> DLPack -> torchvision FCN). Here: decode ->
fused TPU preprocess -> jax FCN, with determinism checks in place of the
reference's detections.json (our model is randomly initialized, so we
verify pipeline-to-model plumbing and decode determinism rather than
specific classes).
"""

import os

import numpy as np
import pytest

GT = "/root/reference/tests/data/test.mp4"

# only the tests that read the reference clip are gated on it; the synth
# oracle below is fully self-contained (round-4 verdict #2)
needs_reference = pytest.mark.skipif(
    not os.path.exists(GT), reason="reference test data not available")


def _oracle_check(clip, golden_path, n_frames=5):
    """Shared decode -> fused preprocess -> fixed-seed FCN -> compare-
    against-committed-fixture drive (the reference's detections.json
    analogue, test_TorchSegmentation.py:239-266)."""
    import jax
    import jax.numpy as jnp

    import vali_tpu as vali
    from vali_tpu.memory.host import host_frame_to_planes
    from vali_tpu.models import fcn
    from vali_tpu.ops.fused import fused_preprocess

    assert os.path.exists(golden_path), "golden fixture missing"
    golden = np.load(golden_path)

    dec = vali.PyDecoder(clip, {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    params = fcn.init_params(jax.random.PRNGKey(0))
    norm = ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
    rgb0 = None
    for i in range(n_frames):
        ok, _ = dec.DecodeSingleFrame(frame)
        assert ok
        planes = host_frame_to_planes(frame, dec.Format, dec.Width,
                                      dec.Height)
        rgb = fused_preprocess(
            tuple(jnp.asarray(p)[None] for p in planes), dec.Format,
            dec.Width, dec.Height, 224, 224, vali.ColorSpace.BT_709,
            vali.ColorRange.MPEG, out_dtype=jnp.float32, normalize=norm)
        if i == 0:
            rgb0 = np.asarray(rgb)
        logits = np.asarray(fcn.apply(params, rgb), dtype=np.float32)[0]
        if i == 0:
            want = golden["logits_frame0"].astype(np.float32)
            scale = max(float(np.abs(want).max()), 1.0)
            err = np.abs(logits - want) / scale
            # float16 fixture quantization + bf16 conv platform jitter
            assert err.max() < 0.02, err.max()
        hist = np.bincount(logits.argmax(-1).reshape(-1), minlength=21)
        want_hist = golden["class_hists"][i]
        agree = np.minimum(hist, want_hist).sum() / want_hist.sum()
        assert agree > 0.98, (i, hist, want_hist)
    return rgb0


def test_golden_logits_oracle_synth(tmp_path):
    """Self-contained correctness oracle: synthesize a COLORFUL clip with
    our own encoder+muxer (chroma='sweep' — flat chroma would make R=G=B
    and let an RGB<->BGR swap pass), then run the full decode -> CSC ->
    resize -> normalize -> fixed-seed-FCN path against the committed
    fixture. Runs on a machine with no /root/reference checkout.

    Regenerate the fixture with tests/make_e2e_golden.py after an
    INTENTIONAL numerics change; an unintentional diff here means
    decode, color conversion, resize phase, normalization constants,
    channel order, or model math drifted."""
    from make_e2e_golden import DATA, SYNTH_KW

    from vali_tpu.utils.synth import synthesize_clip

    clip = synthesize_clip(str(tmp_path / "synth.mp4"), **SYNTH_KW)
    rgb0 = _oracle_check(clip,
                         os.path.join(DATA, "e2e_golden_synth.npz"))
    # the channel-swap tripwire is only armed if the clip is actually
    # colorful after normalization: R and B must differ broadly
    r, b = rgb0[..., 0], rgb0[..., 2]
    assert np.mean(np.abs(r - b)) > 0.2, "synth clip lost its chroma sweep"


@needs_reference
def test_decode_preprocess_inference():
    import jax
    import jax.numpy as jnp

    import vali_tpu as vali
    from vali_tpu.models import fcn
    from vali_tpu.ops.fused import fused_preprocess

    dec = vali.PyDecoder(GT, {}, gpu_id=-1)
    frame = np.zeros(dec.HostFrameSize, dtype=np.uint8)
    ok, _ = dec.DecodeSingleFrame(frame)
    assert ok

    from vali_tpu.memory.host import host_frame_to_planes

    planes = host_frame_to_planes(frame, dec.Format, dec.Width, dec.Height)
    batched = tuple(jnp.asarray(p)[None] for p in planes)
    rgb = fused_preprocess(
        batched, dec.Format, dec.Width, dec.Height, 224, 224,
        vali.ColorSpace.BT_709, vali.ColorRange.MPEG,
        out_dtype=jnp.float32,
        normalize=((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)))
    assert rgb.shape == (1, 224, 224, 3)

    params = fcn.init_params(jax.random.PRNGKey(0))
    logits = fcn.apply(params, rgb)
    assert logits.shape[0] == 1 and logits.shape[-1] == 21
    assert np.isfinite(np.asarray(logits, dtype=np.float32)).all()

    # determinism: decoding the same frame again yields identical logits
    dec2 = vali.PyDecoder(GT, {}, gpu_id=-1)
    frame2 = np.zeros(dec2.HostFrameSize, dtype=np.uint8)
    dec2.DecodeSingleFrame(frame2)
    assert np.array_equal(frame, frame2)
    planes2 = host_frame_to_planes(frame2, dec.Format, dec.Width, dec.Height)
    rgb2 = fused_preprocess(
        tuple(jnp.asarray(p)[None] for p in planes2),
        dec.Format, dec.Width, dec.Height, 224, 224,
        vali.ColorSpace.BT_709, vali.ColorRange.MPEG,
        out_dtype=jnp.float32,
        normalize=((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)))
    logits2 = fcn.apply(params, rgb2)
    assert np.array_equal(np.asarray(logits, dtype=np.float32),
                          np.asarray(logits2, dtype=np.float32))


@needs_reference
def test_golden_logits_oracle():
    """Same oracle on the REFERENCE clip (real H.264 camera footage —
    covers decode paths the synth clip's clean bitstream does not)."""
    from make_e2e_golden import DATA

    _oracle_check(GT, os.path.join(DATA, "e2e_golden.npz"))


@needs_reference
def test_pipeline_into_model():
    import jax
    import jax.numpy as jnp

    from vali_tpu.models import fcn
    from vali_tpu.pipeline.multistream import MultiStreamPipeline

    params = fcn.init_params(jax.random.PRNGKey(0))
    infer = jax.jit(fcn.predict_classes)

    pipe = MultiStreamPipeline([GT], dst_w=64, dst_h=64, gpu_id=0,
                               out_dtype=jnp.float32)
    batches = 0
    for batch, ids in pipe:
        classes = infer(params, batch)
        # default FCN has three stride-2 stages: 64 -> 8
        assert classes.shape == (batch.shape[0], 8, 8)
        batches += 1
        if batches >= 3:
            pipe.stop()
            break
    assert batches >= 3
