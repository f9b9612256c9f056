"""Batched on-device analytics (ops/analytics.py) vs independent numpy
references. Beyond-reference module: the reference has no analytics
stage (users run numpy per frame host-side); parity target here is
numpy semantics, not a reference file."""

import numpy as np
import pytest

from vali_tpu.ops import analytics

RNG = np.random.default_rng(23)


class TestHistogram:
    def test_uint8_matches_bincount(self):
        frames = RNG.integers(0, 256, (4, 37, 53), dtype=np.uint8)
        h = np.asarray(analytics.histogram_batch(frames))
        assert h.shape == (4, 256) and h.dtype == np.int32
        for i in range(4):
            np.testing.assert_array_equal(
                h[i], np.bincount(frames[i].ravel(), minlength=256))

    def test_counts_sum_to_pixels(self):
        frames = RNG.integers(0, 256, (3, 16, 24), dtype=np.uint8)
        h = np.asarray(analytics.histogram_batch(frames, bins=64))
        np.testing.assert_array_equal(h.sum(axis=1), [16 * 24] * 3)

    def test_binning_matches_numpy_histogram(self):
        frames = RNG.integers(0, 256, (2, 31, 33), dtype=np.uint8)
        h = np.asarray(analytics.histogram_batch(frames, bins=32))
        for i in range(2):
            ref, _ = np.histogram(frames[i], bins=32, range=(0, 256))
            np.testing.assert_array_equal(h[i], ref)

    def test_float_range_clamps_to_edge_bins(self):
        frames = np.array([[[-5.0, 0.0, 0.5, 0.999, 1.0, 7.0]]],
                          dtype=np.float32)
        h = np.asarray(analytics.histogram_batch(
            frames, bins=4, value_range=(0.0, 1.0)))
        # -5 clamps into bin 0; 1.0 and 7.0 clamp into bin 3
        np.testing.assert_array_equal(h[0], [2, 0, 1, 3])

    def test_uint16_default_range(self):
        frames = (RNG.integers(0, 1024, (2, 8, 8)) << 6).astype(np.uint16)
        h = np.asarray(analytics.histogram_batch(frames, bins=256))
        for i in range(2):
            ref, _ = np.histogram(frames[i], bins=256, range=(0, 65536))
            np.testing.assert_array_equal(h[i], ref)

    def test_float_requires_range(self):
        with pytest.raises(ValueError, match="value_range"):
            analytics.histogram_batch(np.zeros((1, 4, 4), np.float32))

    def test_channels_fold_into_the_frame(self):
        frames = RNG.integers(0, 256, (2, 9, 11, 3), dtype=np.uint8)
        h = np.asarray(analytics.histogram_batch(frames))
        for i in range(2):
            np.testing.assert_array_equal(
                h[i], np.bincount(frames[i].ravel(), minlength=256))


class TestLumaStats:
    def test_matches_numpy(self):
        frames = RNG.integers(0, 256, (5, 13, 17), dtype=np.uint8)
        st = analytics.luma_stats_batch(frames)
        f64 = frames.astype(np.float64)
        np.testing.assert_allclose(np.asarray(st["mean"]),
                                   f64.mean(axis=(1, 2)), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(st["std"]),
                                   f64.std(axis=(1, 2)), rtol=1e-4)
        np.testing.assert_array_equal(np.asarray(st["min"]),
                                      f64.min(axis=(1, 2)))
        np.testing.assert_array_equal(np.asarray(st["max"]),
                                      f64.max(axis=(1, 2)))

    def test_constant_frame_zero_std(self):
        frames = np.full((1, 8, 8), 100, dtype=np.uint8)
        st = analytics.luma_stats_batch(frames)
        assert float(st["std"][0]) == 0.0
        assert float(st["mean"][0]) == 100.0

    def test_high_mean_low_variance_no_cancellation(self):
        """One-pass E[x^2]-mean^2 catastrophically cancelled in f32: a
        flat uint16 frame of 60000 reported std ~139 instead of 0. The
        two-pass form must hold near-zero std for high-mean flat and
        near-flat frames (black-frame/flash QC on 16-bit content)."""
        flat = np.full((1, 64, 64), 60000, dtype=np.uint16)
        st = analytics.luma_stats_batch(flat)
        assert float(st["std"][0]) == 0.0
        near = flat.copy()
        near[0, 0, 0] = 60004  # true std ~= 0.0625
        st = analytics.luma_stats_batch(near)
        want = near.astype(np.float64).std()
        assert abs(float(st["std"][0]) - want) < 1e-2 * want + 1e-3


class TestSceneChange:
    def _clip_with_cut(self, n=12, cut=6, h=32, w=48):
        """Static noise scene A, then a differently-distributed scene B,
        with small per-frame jitter inside each scene."""
        base_a = RNG.integers(40, 80, (h, w)).astype(np.int16)
        base_b = RNG.integers(170, 230, (h, w)).astype(np.int16)
        frames = []
        for i in range(n):
            base = base_a if i < cut else base_b
            jitter = RNG.integers(-3, 4, (h, w)).astype(np.int16)
            frames.append(np.clip(base + jitter, 0, 255).astype(np.uint8))
        return np.stack(frames)

    def test_sad_matches_numpy(self):
        frames = RNG.integers(0, 256, (6, 10, 14), dtype=np.uint8)
        s = np.asarray(analytics.frame_diff_scores(frames))
        f64 = frames.astype(np.float64)
        ref = np.abs(f64[1:] - f64[:-1]).mean(axis=(1, 2)) / 255.0
        np.testing.assert_allclose(s, ref, rtol=1e-5)
        assert s.shape == (5,)

    def test_hist_delta_bounds(self):
        frames = self._clip_with_cut()
        hd = np.asarray(analytics.hist_delta_scores(frames))
        assert np.all(hd >= 0.0) and np.all(hd <= 1.0)
        # disjoint intensity ranges -> L1 distance ~1 at the cut
        assert hd[5] > 0.9
        assert np.all(np.delete(hd, 5) < 0.3)

    def test_detect_single_cut(self):
        frames = self._clip_with_cut(cut=6)
        cuts = analytics.detect_scene_changes(frames, threshold=0.3)
        np.testing.assert_array_equal(cuts, [6])

    def test_detect_min_gap_suppresses_dissolve(self):
        # a 3-frame linear dissolve: several consecutive high scores
        a = np.full((24, 24), 40, dtype=np.float64)
        b = np.full((24, 24), 220, dtype=np.float64)
        ramp = [a, a, a * 0.6 + b * 0.4, a * 0.2 + b * 0.8, b, b]
        frames = np.stack([r.astype(np.uint8) for r in ramp])
        loose = analytics.detect_scene_changes(
            frames, threshold=0.15, min_gap=1)
        gapped = analytics.detect_scene_changes(
            frames, threshold=0.15, min_gap=3)
        assert len(loose) >= 2
        assert len(gapped) == 1

    def test_no_cut_in_static_clip(self):
        frame = RNG.integers(0, 256, (20, 20), dtype=np.uint8)
        frames = np.stack([frame] * 8)
        cuts = analytics.detect_scene_changes(frames, threshold=0.1)
        assert len(cuts) == 0

    def test_blend_weight_endpoints(self):
        frames = self._clip_with_cut(n=4, cut=2)
        sad = np.asarray(analytics.frame_diff_scores(frames))
        hd = np.asarray(analytics.hist_delta_scores(
            frames, value_range=(0.0, 256.0)))
        only_sad = np.asarray(analytics.scene_change_scores(
            frames, hist_weight=0.0))
        only_hd = np.asarray(analytics.scene_change_scores(
            frames, hist_weight=1.0))
        np.testing.assert_allclose(only_sad, sad, rtol=1e-6)
        np.testing.assert_allclose(only_hd, hd, rtol=1e-6)


class TestHighBitDepth:
    """10/12/16-bit and float inputs must not inherit the 8-bit
    normalization (review round 4 finding)."""

    def _clip16(self, lo_a, hi_a, lo_b, hi_b, n=8, cut=4, h=24, w=32):
        frames = []
        for i in range(n):
            lo, hi = (lo_a, hi_a) if i < cut else (lo_b, hi_b)
            frames.append(RNG.integers(lo, hi, (h, w)).astype(np.uint16))
        return np.stack(frames)

    def test_lsb_10bit_with_explicit_peak(self):
        clip = self._clip16(100, 300, 700, 1000)
        scores = np.asarray(analytics.scene_change_scores(clip, peak=1023.0))
        assert scores[3] > 0.3
        assert np.all(np.delete(scores, 3) < 0.2)
        cuts = analytics.detect_scene_changes(clip, threshold=0.3,
                                              peak=1023.0)
        np.testing.assert_array_equal(cuts, [4])

    def test_msb_p10_with_default_uint16_peak(self):
        # P10-style MSB alignment: the uint16 default peak (65535) and
        # histogram range apply without any explicit peak
        clip = self._clip16(100, 300, 700, 1000) << 6
        scores = np.asarray(analytics.scene_change_scores(clip))
        assert scores[3] > 0.3
        assert np.all(np.delete(scores, 3) < 0.2)

    def test_float_code_values_default_peak(self):
        a = RNG.uniform(0.05, 0.25, (4, 16, 16)).astype(np.float32)
        b = RNG.uniform(0.70, 0.95, (4, 16, 16)).astype(np.float32)
        clip = np.concatenate([a, b])
        scores = np.asarray(analytics.scene_change_scores(clip))
        assert scores[3] > 0.3 and np.all(np.delete(scores, 3) < 0.2)

    def test_sad_peak_default_matches_explicit(self):
        clip = self._clip16(0, 1024, 0, 1024)
        np.testing.assert_allclose(
            np.asarray(analytics.frame_diff_scores(clip)),
            np.asarray(analytics.frame_diff_scores(clip, peak=65535.0)))
