"""The bench time-budget plumbing must degrade, never starve entirely."""

import time

import bench_configs as bc


def test_exhausted_deadline_still_runs_minimum_window(monkeypatch):
    ran = []
    monkeypatch.setattr(bc, "ALL_CONFIGS", [
        ("a", lambda: (ran.append("a"), {"v": 1})[1], 0),
        ("b", lambda: (ran.append("b"), {"v": 2})[1], 0),
    ])
    # deadline long past: the minimum window must still let the quick
    # configs record instead of skipping everything
    res = bc.run_all(deadline=time.monotonic() - 9999)
    assert res["a"] == {"v": 1} and res["b"] == {"v": 2}
    assert ran == ["a", "b"]


def test_mid_run_deadline_skips_remaining(monkeypatch):
    def slow():
        bc._DEADLINE = time.monotonic() - 1  # simulate budget exhaustion
        return {"v": 1}

    monkeypatch.setattr(bc, "ALL_CONFIGS", [
        ("a", slow, 0), ("b", lambda: {"v": 2}, 0)])
    res = bc.run_all(deadline=time.monotonic() + 9999)
    assert res["a"] == {"v": 1}
    assert "skipped" in res["b"]


def test_min_budget_skips_expensive_config(monkeypatch):
    """A config whose min_budget exceeds the remaining window is skipped
    with a note; cheaper ones after it still run."""
    monkeypatch.setattr(bc, "ALL_CONFIGS", [
        ("pricey", lambda: {"v": 1}, 100000),
        ("cheap", lambda: {"v": 2}, 0)])
    res = bc.run_all(deadline=time.monotonic() + 200)
    assert "skipped" in res["pricey"]
    assert res["cheap"] == {"v": 2}


def test_config_error_is_contained(monkeypatch):
    def boom():
        raise RuntimeError("nope")

    monkeypatch.setattr(bc, "ALL_CONFIGS", [
        ("a", boom, 0), ("b", lambda: {"v": 2}, 0)])
    res = bc.run_all()
    assert "RuntimeError" in res["a"]["error"]
    assert res["b"] == {"v": 2}


def test_sink_receives_each_config_as_it_lands(monkeypatch):
    """bench.py passes RESULT['configs'] as the sink so the watchdog's
    partial emit carries every completed config."""
    sink = {}
    seen_at_b = {}
    monkeypatch.setattr(bc, "ALL_CONFIGS", [
        ("a", lambda: {"v": 1}, 0),
        ("b", lambda: (seen_at_b.update(sink), {"v": 2})[1], 0),
    ])
    msgs = []
    out = bc.run_all(sink=sink, progress=msgs.append)
    assert out is sink
    assert sink == {"a": {"v": 1}, "b": {"v": 2}}
    # 'a' was already in the sink when 'b' started
    assert seen_at_b == {"a": {"v": 1}}
    assert any("config a" in m for m in msgs)


def test_watchdog_partial_emit_shape(capsys, monkeypatch):
    """The emergency emit prints valid single-line JSON carrying the
    configs collected so far (os._exit stubbed out)."""
    import json
    import os

    import bench

    exited = []
    monkeypatch.setattr(os, "_exit", lambda code: exited.append(code))
    bench.RESULT["configs"]["done_one"] = {"v": 3}
    try:
        bench._emit_partial("test-reason")
        out = capsys.readouterr().out.strip()
        d = json.loads(out)
        assert d["aborted"] == "test-reason"
        assert d["configs"]["done_one"] == {"v": 3}
        assert exited == [0]
        # exactly-once: a second emit (or main's final print) is a no-op
        bench._emit_partial("again")
        assert capsys.readouterr().out == ""
    finally:
        bench._DONE.clear()
        bench.RESULT["configs"].pop("done_one", None)
        bench.RESULT.pop("aborted", None)


def test_partial_emit_noop_after_done(capsys):
    import bench

    bench._DONE.set()
    try:
        bench._emit_partial("late")
        assert capsys.readouterr().out == ""
    finally:
        bench._DONE.clear()
        bench.RESULT.pop("aborted", None)


def test_hard_deadline_caps_minimum_window(monkeypatch):
    """The 150s grace window must never schedule a config the bench
    watchdog will kill mid-run: hard_deadline (watchdog - margin) wins."""
    ran = []
    monkeypatch.setattr(bc, "ALL_CONFIGS", [
        ("a", lambda: (ran.append("a"), {"v": 1})[1], 10),
    ])
    now = time.monotonic()
    # exhausted budget, but hard_deadline only 5s away: the window is
    # capped below the config's 10s gate -> it must skip, not start
    res = bc.run_all(deadline=now - 100, hard_deadline=now + 5)
    assert "skipped" in res["a"]
    assert ran == []


def test_chipside_config_runs_scaled_down():
    """Execute config5_pipeline_chipside's REAL code path (decode ->
    stage -> staging-ring snapshot -> _split -> _dispatch_planes slope ->
    device JPEG slope) scaled down on the CPU backend. Guards the
    staging-ring read against the stager-thread race (the ring is only
    inspected after the iterator is closed) and the _slope_time baseline
    subtraction end-to-end."""
    res = bc.config5_pipeline_chipside(B=2, dst=32, K_dispatch=(2, 6),
                                       K_jpeg=(2, 6))
    assert res["value"] > 0
    assert res["ms_per_batch"] > 0
    assert res["jpeg_device_ms_per_batch"] > 0


def test_chipside_sink_fills_progressively_and_gates_jpeg():
    """With a sink dict and an exhausted budget, chipside must (1) fill
    the sink with a final fps (the short-chain provisional is overwritten
    by the slope), and (2) skip the device-JPEG stage with a note instead
    of risking the primary number on two more remote compiles."""
    sink = {}
    res = bc.config5_pipeline_chipside(B=2, dst=32, K_dispatch=(2, 6),
                                       sink=sink, time_left=lambda: 10.0)
    assert res is sink
    assert sink["value"] > 0 and sink["ms_per_batch"] > 0
    assert "partial" not in sink          # provisional marker cleared
    assert "jpeg_skipped" in sink         # budget-gated secondary stage
    assert "jpeg_device_ms_per_batch" not in sink


def test_chipside_jpeg_runs_with_budget():
    sink = {}
    bc.config5_pipeline_chipside(B=2, dst=32, K_dispatch=(2, 6),
                                 K_jpeg=(2, 6), sink=sink,
                                 time_left=lambda: 9999.0)
    assert sink["jpeg_device_ms_per_batch"] > 0
    assert "jpeg_skipped" not in sink


def test_slope_time_on_short_provisional():
    """The on_short callback must fire once, after the short chain only,
    with a positive per-call estimate — it is what a watchdog abort
    mid-long-compile would leave in the JSON."""
    import numpy as np

    got = []
    x = np.zeros((4, 8), dtype=np.uint8)
    bc._slope_time(lambda v: v + 1, x, K_short=4, K_long=16, reps=2,
                   on_short=got.append)
    assert len(got) == 1 and got[0] > 0


def test_slope_time_subtracts_loop_baseline():
    """_slope_time must report (near-)zero for a free function: the
    fori_loop perturbation overhead is measured by a kernel-free
    baseline pass and subtracted, so an identity 'kernel' times at the
    1e-9 floor rather than at the ~30us/iter loop cost."""
    import numpy as np

    x = np.zeros((4, 8), dtype=np.uint8)
    per_call = bc._slope_time(lambda v: v, x, K_short=4, K_long=16,
                              reps=3)
    # identity inside the same loop structure: everything cancels except
    # jitter; a material positive residual means the baseline is not
    # being subtracted
    assert per_call < 5e-4, per_call


def test_make_loop_traced_k_signature():
    """bench._make_loop(kernel, consume) -> run(x, K, apply_kernel) with
    K a TRACED loop bound: one compiled program serves every chain
    length and both baselines. xla_contrast_probe.py imports this exact
    function — the r5 traced-K refactor silently broke the probe's old
    (kernel, K, consume) call shape, so pin the signature here."""
    import jax.numpy as jnp
    import numpy as np

    import bench

    x = jnp.asarray(np.zeros((4, 8, 8), dtype=np.uint8))
    consume = lambda f, xx: jnp.sum(f(xx).astype(jnp.int32))
    run = bench._make_loop(lambda v: v + 1, consume)
    t = jnp.asarray(True)
    f = jnp.asarray(False)
    # same executable across chain lengths and both cond branches
    k4 = float(run(x, jnp.int32(4), t))
    k12 = float(run(x, jnp.int32(12), t))
    b4 = float(run(x, jnp.int32(4), f))
    assert k4 != b4  # kernel branch actually applies the kernel
    assert k12 != k4  # K is live, not baked in


def test_main_live_path_control_flow(capsys, monkeypatch):
    """End-to-end control flow of bench.main() on the CPU backend with
    the device timing faked: the round-4 ordering must (1) record the
    host-bound numbers, (2) run the target-bearing configs 2 + chipside
    unconditionally right after the headline, (3) not re-run them in
    run_all (skip-existing), and (4) emit ONE JSON line carrying all of
    it under the renamed tunnel_h2d keys."""
    import json
    import os

    import bench

    monkeypatch.setenv("VALI_BENCH_BUDGET_S", "600")
    # if anything trips _emit_partial, it must not os._exit the pytest
    # process (which would read as a green run with most tests unrun)
    monkeypatch.setattr(os, "_exit", lambda code: None)
    monkeypatch.setattr(bench, "_time_kernel",
                        lambda *a, **k: (0.001, 0.01))
    calls = []
    monkeypatch.setattr(
        bc, "config2_convert_resize_tpu",
        lambda: (calls.append("2"), {"value": 111.0})[1])

    def fake_chipside(sink=None, time_left=None):
        # bench.py must pass a LIVE sink (pre-registered in RESULT) and
        # its budget callable so the config can fill progressively and
        # gate the JPEG stage
        calls.append("chip")
        assert sink is not None and callable(time_left)
        sink["value"] = 222.0
        return sink

    monkeypatch.setattr(bc, "config5_pipeline_chipside", fake_chipside)
    monkeypatch.setattr(bc, "ALL_CONFIGS", [
        # the target-bearing pair already landed via the direct calls —
        # run_all must SKIP them even with different fakes registered
        ("2_tpu_two_stage_convert_resize", lambda: {"value": -1}, 0),
        ("5_pipeline_chipside", lambda: {"value": -1}, 0),
        ("3_transcode_4k_hevc",
         lambda: (calls.append("3"), {"value": 3.0})[1], 0),
    ])
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(out)
    try:
        assert "aborted" not in d, d
        # (1) host-bound numbers are real (reference clip or synth)
        assert d["sw_decode_fps_single_stream_848x464"] > 0
        assert d["configs"]["1_sw_decode_cpu_convert"]["value"] > 0
        # (2) + (3): direct-call values survived, run_all skipped them
        assert d["configs"]["2_tpu_two_stage_convert_resize"] == \
            {"value": 111.0}
        assert d["configs"]["5_pipeline_chipside"] == {"value": 222.0}
        assert calls.count("2") == 1 and calls.count("chip") == 1
        # the product-path north star runs BEFORE the cheap config 2:
        # under a degraded tunnel the cheap number is the one at risk
        # (round-4 verdict #1 — chipside missed the driver line twice)
        assert calls.index("chip") < calls.index("2")
        assert d["configs"]["3_transcode_4k_hevc"] == {"value": 3.0}
        # headline computed from the faked slope
        assert d["value"] > 0
        # (4) renamed tunnel metric, old name gone
        assert "tunnel_h2d_gbytes_per_sec" in d
        assert "h2d_staging_gbytes_per_sec" not in d
    finally:
        bench._DONE.clear()
        bench.RESULT["configs"].clear()
        bench.RESULT["value"] = 0.0
