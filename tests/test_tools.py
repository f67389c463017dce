"""Replica-artifact writer invariants (round-7 verdict #1).

The round-7 replica artifact lost 21 stdout-captured lines against its own
summary; ``tools/check_oracle.py`` now writes the artifact itself in one
atomic rename and self-checks line count == checked-query count.  These
tests pin that contract without a Spark session.
"""

import importlib.util
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "check_oracle",
    os.path.join(os.path.dirname(__file__), "..", "tools", "check_oracle.py"),
)
check_oracle = importlib.util.module_from_spec(_SPEC)
sys.modules["check_oracle"] = check_oracle
_SPEC.loader.exec_module(check_oracle)


def test_artifact_write_is_self_consistent(tmp_path):
    out = tmp_path / "replica.txt"
    lines = [
        "PASS  q01_pricing_summary: 6 rows  (1.0s)",
        "FAIL  q99_bogus: rows 1 vs 2; cols ['a:i'] vs ['a:i']",
        "rows-only  q29_approx_stats: 8 rows  (0.5s)",
    ]
    check_oracle._write_artifact(str(out), lines, "1 pass / 1 fail / 1 rows-only", 3)
    text = out.read_text()
    assert all(l in text for l in lines)
    assert "1 pass / 1 fail / 1 rows-only" in text
    assert "3 result lines == 3 checked queries" in text


def test_artifact_write_refuses_dropped_lines(tmp_path):
    out = tmp_path / "replica.txt"
    with pytest.raises(RuntimeError, match="self-check failed"):
        check_oracle._write_artifact(
            str(out), ["PASS  only_one: 1 rows  (0.1s)"], "2 pass / 0 fail / 0 rows-only", 2
        )
    assert not out.exists()  # nothing partial left behind


def test_artifact_write_is_atomic_no_tmp_left(tmp_path):
    out = tmp_path / "replica.txt"
    check_oracle._write_artifact(str(out), ["PASS  q: 1 rows  (0.1s)"], "1 pass / 0 fail / 0 rows-only", 1)
    assert os.listdir(tmp_path) == ["replica.txt"]


# ---------------------------------------------------------------------------
# bench_noise contention handling (round-12): a band session must not keep a
# hypervisor-contended run (it inflates per-query maxima 2-5x and hides real
# regressions behind the envelope), and must refuse to write a band at all
# when contention persists past one fresh-subprocess retry per run.

_BN_SPEC = importlib.util.spec_from_file_location(
    "bench_noise",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bench_noise.py"),
)
bench_noise = importlib.util.module_from_spec(_BN_SPEC)
sys.modules["bench_noise"] = bench_noise
_BN_SPEC.loader.exec_module(bench_noise)


def _fake_runs(totals):
    it = iter(totals)

    def _run(i):
        v = next(it)
        return {
            "value": v,
            "queries": {"q01": round(v / 50, 3)},
            "load_avg_before": [0.1, 0.1, 0.1],
            "idle_wait_sec": 0,
            "cold_total_sec": v,
            "load_avg_after": [1.0, 1.0, 1.0],
        }

    return _run


def test_bench_noise_contended_run_is_retried_and_kept_verbatim(
    tmp_path, monkeypatch
):
    import json

    out = tmp_path / "band.json"
    monkeypatch.setattr(bench_noise, "_one_run", _fake_runs([57.0, 110.0, 55.0, 56.0]))
    monkeypatch.setattr(sys, "argv", ["bench_noise.py", "3", str(out)])
    assert bench_noise.main() == 0
    band = json.loads(out.read_text())
    assert sorted(band["totals_sec"]) == [55.0, 56.0, 57.0]
    assert [r["value"] for r in band["_contended_runs_discarded"]] == [110.0]
    # the contaminated total must not leak into the per-query envelope
    assert band["queries"]["q01"]["max"] < 110.0 / 50


def test_bench_noise_refuses_band_when_contention_persists(
    tmp_path, monkeypatch
):
    out = tmp_path / "band.json"
    # run 1 is contended and its single retry is contended too -> rc 1, no file
    monkeypatch.setattr(bench_noise, "_one_run", _fake_runs([57.0, 110.0, 55.0, 120.0]))
    monkeypatch.setattr(sys, "argv", ["bench_noise.py", "3", str(out)])
    assert bench_noise.main() == 1
    assert not out.exists()
