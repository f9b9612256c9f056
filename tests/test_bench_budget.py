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
