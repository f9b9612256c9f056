"""Batched on-device quality metrics (ops/metrics.py) vs independent
numpy references (PSNR definition parity: reference
tests/test_common.py:81-88)."""

import numpy as np
import pytest

from vali_tpu.ops import metrics

RNG = np.random.default_rng(11)


def _ref_psnr(gt, dist, peak=255.0):
    """The reference's measure_psnr, verbatim semantics."""
    mse = np.mean((gt.astype(np.float64) - dist.astype(np.float64)) ** 2)
    if mse == 0.0:
        return np.inf
    return 20 * np.log10(peak) - 10 * np.log10(mse)


def _ref_ssim(a, b, peak=255.0, win=8):
    """Independent numpy SSIM (uniform window, valid mode, unbiased
    moments) — deliberately a different implementation shape (cumsum
    box filter) from the reduce_window version under test."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)

    def box(x):
        # valid-mode win x win moving average via 2D cumsum
        c = np.cumsum(np.cumsum(x, axis=0), axis=1)
        c = np.pad(c, ((1, 0), (1, 0)))
        s = (c[win:, win:] - c[:-win, win:] - c[win:, :-win]
             + c[:-win, :-win])
        return s / (win * win)

    c1, c2 = (0.01 * peak) ** 2, (0.03 * peak) ** 2
    np_ = win * win
    norm = np_ / (np_ - 1.0)
    mu_a, mu_b = box(a), box(b)
    var_a = (box(a * a) - mu_a ** 2) * norm
    var_b = (box(b * b) - mu_b ** 2) * norm
    cov = (box(a * b) - mu_a * mu_b) * norm
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2))
    return float(s.mean())


def test_psnr_matches_reference_definition():
    a = RNG.integers(0, 256, (3, 48, 64), dtype=np.uint8)
    noise = RNG.integers(-6, 7, a.shape)
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    got = np.asarray(metrics.psnr_batch(a, b))
    for i in range(a.shape[0]):
        want = _ref_psnr(a[i], b[i])
        assert abs(got[i] - want) < 1e-3, (i, got[i], want)


def test_psnr_identical_is_inf_and_mse_zero():
    a = RNG.integers(0, 256, (2, 32, 32), dtype=np.uint8)
    assert np.all(np.isinf(np.asarray(metrics.psnr_batch(a, a.copy()))))
    assert np.allclose(np.asarray(metrics.mse_batch(a, a.copy())), 0.0)


def test_psnr_batch_is_per_item():
    a = RNG.integers(0, 256, (2, 32, 32), dtype=np.uint8)
    b = a.copy()
    b[1] = np.clip(b[1].astype(int) + 20, 0, 255).astype(np.uint8)
    got = np.asarray(metrics.psnr_batch(a, b))
    assert np.isinf(got[0]) and got[1] < 30


@pytest.mark.parametrize("shape", [(2, 40, 56), (2, 40, 56, 3)])
def test_ssim_matches_numpy_reference(shape):
    a = RNG.integers(0, 256, shape, dtype=np.uint8)
    noise = RNG.integers(-10, 11, shape)
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    got = np.asarray(metrics.ssim_batch(a, b))
    for i in range(shape[0]):
        if len(shape) == 3:
            want = _ref_ssim(a[i], b[i])
        else:
            want = float(np.mean([_ref_ssim(a[i, ..., c], b[i, ..., c])
                                  for c in range(shape[-1])]))
        assert abs(got[i] - want) < 1e-4, (i, got[i], want)
    assert np.all(got < 1.0)


def test_ssim_identical_is_one():
    a = RNG.integers(0, 256, (2, 33, 47), dtype=np.uint8)
    got = np.asarray(metrics.ssim_batch(a, a.copy()))
    assert np.allclose(got, 1.0, atol=1e-6)


def test_ssim_window_larger_than_frame_raises():
    a = np.zeros((1, 6, 6), dtype=np.uint8)
    with pytest.raises(ValueError, match="smaller than SSIM window"):
        metrics.ssim_batch(a, a, win=8)


def test_metrics_on_transcode_pair():
    """End-to-end usage: encode a clip lossily, decode it back, and
    score decoded-vs-source on device — the production validation loop
    the reference does host-side one frame at a time."""
    import os
    import tempfile

    import vali_tpu as vali
    from vali_tpu.utils.synth import synthesize_clip

    w, h, n = 128, 96, 6
    clip = synthesize_clip(
        os.path.join(tempfile.mkdtemp(prefix="vali_metrics_"), "m.mp4"),
        w=w, h=h, n=n)
    dec = vali.PyDecoder(clip, {}, gpu_id=-1)
    ys = []
    frame = np.zeros(dec.HostFrameSize, np.uint8)
    while dec.DecodeSingleFrame(frame)[0]:
        ys.append(frame[:w * h].reshape(h, w).copy())
    assert len(ys) == n
    got = np.asarray(metrics.psnr_batch(
        np.stack(ys), np.stack([ys[0]] * n)))
    # frame 0 vs itself is inf; later frames drift (moving gradient)
    assert np.isinf(got[0])
    assert np.all(np.isfinite(got[1:]))
    assert np.all(got[1:] > 20)
