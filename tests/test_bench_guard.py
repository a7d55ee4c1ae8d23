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
