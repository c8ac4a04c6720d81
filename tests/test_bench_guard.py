r"""Tests for bench.py's regression guard (VERDICT r4 #6): the sweep must
fail loudly when a workload drops more than the tolerance below the last
recorded BENCH_NOTES.md row — "converged" numbers are enforced, not
remembered."""

import importlib.util
import pathlib
import pytest

pytestmark = pytest.mark.smoke  # sub-minute sanity tier (see CONTRIBUTING.md)

ROOT = pathlib.Path(__file__).parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", ROOT / "bench.py")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def test_last_sweep_row_parses_history():
    bench = _load_bench()
    row = bench._last_sweep_row()

    # BENCH_NOTES.md ships with the repo and always has at least one row.
    assert "adm256" in row
    assert all(isinstance(v, float) and v > 0 for v in row.values())
    # Every sweep workload is tracked.
    for name in [*bench.WORKLOADS, "train32"]:
        assert name in row, name


def test_regression_threshold_fires():
    r"""A deliberate >3% slowdown against the last row is flagged; values at
    or above (1 - tolerance) x prior are not."""

    bench = _load_bench()
    prior = bench._last_sweep_row()["adm256"]
    tol = bench.REGRESSION_TOLERANCE

    slow = prior * (1 - tol) * 0.98  # 5%-ish total drop
    ok = prior * (1 - tol) * 1.01

    assert slow < prior * (1 - tol)  # would be appended to `regressions`
    assert not (ok < prior * (1 - tol))


def test_last_sweep_row_missing_file(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.setattr(
        bench, "__file__", str(tmp_path / "bench.py"), raising=False
    )
    # Re-point the module's path resolution at an empty directory.
    import pathlib as _pathlib

    original = _pathlib.Path(bench.__file__).parent / "BENCH_NOTES.md"
    assert not original.exists()
    assert bench._last_sweep_row() == {}
