"""bench.py's driver contract: exactly one JSON line on stdout, including
when the accelerator backend is wedged (RESULTS.md round-3 incident — init
hangs forever without the watchdog)."""

import json
import sys

import numpy as np


def _load_bench():
    sys.path.insert(0, "/root/repo")
    import importlib

    import bench

    return importlib.reload(bench)


def test_backend_unavailable_prints_json_error(monkeypatch, capsys):
    bench = _load_bench()
    monkeypatch.setattr(
        bench, "_devices_with_watchdog",
        lambda *a, **k: (_ for _ in ()).throw(
            TimeoutError("accelerator backend init exceeded 600s")),
    )
    result = bench.main()
    out_lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(out_lines) == 1
    parsed = json.loads(out_lines[0])
    assert parsed["metric"] == "train_images_per_sec_per_chip"
    assert parsed["value"] == 0.0 and parsed["vs_baseline"] == 0.0
    assert "backend unavailable" in parsed["extra"]["error"]
    assert "last_good_measurement" in parsed["extra"]
    assert result == parsed


def test_watchdog_times_out_on_hanging_init(monkeypatch):
    bench = _load_bench()
    import jax

    def hang_forever():
        import time

        time.sleep(3600)

    monkeypatch.setattr(jax, "devices", hang_forever)
    try:
        bench._devices_with_watchdog(timeout_s=1.0)
        raised = False
    except TimeoutError as e:
        raised = True
        assert "wedged" in str(e)
    assert raised


def test_run_bounded_watchdog():
    """The compile/warmup stage has the same wedge protection as init:
    values pass through, exceptions re-raise, hangs become TimeoutError."""
    import pytest

    bench = _load_bench()
    assert bench._run_bounded(lambda: 42, 5.0, "x") == 42
    with pytest.raises(ValueError, match="boom"):
        bench._run_bounded(
            lambda: (_ for _ in ()).throw(ValueError("boom")), 5.0, "x")

    def hang():
        import time

        time.sleep(3600)

    with pytest.raises(TimeoutError, match="wedged"):
        bench._run_bounded(hang, 0.5, "compile")


def test_result_schema_fields():
    """The driver parses metric/value/unit/vs_baseline; pin the schema."""
    bench = _load_bench()
    assert bench.H100_TORCH_ESTIMATE == 600.0
    assert np.isclose(1845.8 / bench.H100_TORCH_ESTIMATE, 3.076, atol=0.01)
