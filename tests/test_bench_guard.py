"""The driver runs `python bench.py` unattended: if the TPU tunnel is down
the probe must convert an indefinite hang into one honest JSON line."""

import json

import bench


def test_probe_timeout_returns_false():
    # the probe mirrors bench's real backend selection (the axon plugin
    # overrides JAX_PLATFORMS, so this hits the tunnel) — with a timeout
    # shorter than a jax import it must come back False, never hang
    assert bench._probe_backend(timeout_s=1.0) is False


def test_unreachable_backend_emits_error_json(monkeypatch, capsys):
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: False)
    bench.main()
    out = capsys.readouterr().out.strip()
    result = json.loads(out)
    assert result["value"] is None
    assert result["vs_baseline"] is None
    assert "unreachable" in result["error"]
    # stale numbers must be clearly labeled as such, never in "value"
    assert "stale_fifo_sec_per_frame" in result
    assert "NOT from this run" in result["error"]


def _fake_fifo():
    return {"metric": "fifo", "value": 1.8, "unit": "s", "vs_baseline": 1.04}


def test_primary_line_survives_later_section_crash(monkeypatch, capsys):
    """r5 protocol: the FIFO JSON is printed BEFORE later sections run, and
    a crash in one section is recorded without erasing the primary value
    (BENCH_r04 was rc=124 with zero output under the old all-or-nothing
    print)."""
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: True)
    monkeypatch.setattr(bench, "bench_fifo", _fake_fifo)
    monkeypatch.setattr(bench, "bench_fifo_seg",
                        lambda: (_ for _ in ()).throw(RuntimeError("boom")))
    monkeypatch.setattr(bench, "bench_t2v", lambda: {"t2v_clip_s": 12.0})
    monkeypatch.delenv("BENCH_MODE", raising=False)
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) >= 2  # early emission + merged re-prints
    first, last = json.loads(lines[0]), json.loads(lines[-1])
    assert first["value"] == 1.8  # primary emitted before any later section
    assert last["value"] == 1.8
    assert "boom" in last["fifo_seg_error"]
    assert last["t2v_clip_s"] == 12.0  # later sections still ran


def test_budget_skips_sections_and_reports(monkeypatch, capsys):
    """A tiny BENCH_BUDGET_S must skip the later sections, list them in
    sections_skipped, and still leave the primary value on the LAST line
    (what the driver parses)."""
    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: True)
    monkeypatch.setattr(bench, "bench_fifo", _fake_fifo)

    def never(*a):
        raise AssertionError("section must not run when over budget")

    monkeypatch.setattr(bench, "bench_fifo_seg", never)
    monkeypatch.setattr(bench, "bench_t2v", never)
    monkeypatch.delenv("BENCH_MODE", raising=False)
    monkeypatch.setenv("BENCH_BUDGET_S", "0")
    bench.main()
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    last = json.loads(lines[-1])
    assert last["value"] == 1.8
    assert last["sections_skipped"] == ["fifo_seg", "t2v"]


def test_fifo_crash_still_emits_error_json(monkeypatch, capsys):
    """bench_fifo itself raising leaves an honest error line (with labeled
    stale numbers) instead of rc-only silence."""
    import pytest

    monkeypatch.setattr(bench, "_probe_backend", lambda **kw: True)
    monkeypatch.setattr(bench, "bench_fifo",
                        lambda: (_ for _ in ()).throw(RuntimeError("dead")))
    monkeypatch.delenv("BENCH_MODE", raising=False)
    with pytest.raises(RuntimeError):
        bench.main()
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["value"] is None
    assert "dead" in result["error"]
    assert "stale_fifo_sec_per_frame" in result
