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
