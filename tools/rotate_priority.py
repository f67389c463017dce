"""Suggest the next round's registry priority from driver CORRECTNESS files.

The driver's correctness gate records a bounded window of registry entries
(observed: the first 50 of ``load_all()``'s iteration order), so between
rounds the ``_PRIORITY`` list in ``worker_etl_spark/queries/__init__.py``
should rotate: entries that just received a green row move back, entries
without a recent row move forward.  This tool reads every
``CORRECTNESS_r*.json`` in the repo root, ranks each registered query by
(has it EVER failed and not been re-verified, how stale its newest green
row is), and prints a ready-to-paste python list.

Usage: python tools/rotate_priority.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from worker_etl_spark.queries import load_all  # noqa: E402


def main() -> None:
    rounds: list[tuple[int, dict]] = []
    for path in glob.glob(os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as fh:
            rounds.append((int(m.group(1)), json.load(fh)))
    rounds.sort()
    if not rounds:
        print("no CORRECTNESS_r*.json found", file=sys.stderr)
        raise SystemExit(1)

    latest_green: dict[str, int] = {}
    latest_fail: dict[str, int] = {}
    for rnd, data in rounds:
        for name, row in data.items():
            ok = bool(row.get("hash_match")) or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if ok:
                latest_green[name] = rnd
            elif row.get("err") != "no_oracle":
                latest_fail[name] = rnd

    names = list(load_all())
    newest = rounds[-1][0]

    def rank(name: str) -> tuple:
        g, f = latest_green.get(name), latest_fail.get(name)
        failed_unverified = f is not None and (g is None or g < f)
        never_checked = g is None and f is None
        staleness = newest - g if g is not None else newest + 1
        # order: failed-and-never-reverified, never-checked, stalest green
        return (
            0 if failed_unverified else 1 if never_checked else 2,
            -staleness,
            name,
        )

    ordered = sorted(names, key=rank)
    print(f"# suggested _PRIORITY after round {newest} "
          f"({len(names)} registered; window covers ~50):")
    print("_PRIORITY: list[str] = [")
    for n in ordered:
        g, f = latest_green.get(n), latest_fail.get(n)
        tag = (
            "FAILED-UNVERIFIED" if rank(n)[0] == 0
            else "never-checked" if rank(n)[0] == 1
            else f"green r{g}"
        )
        print(f'    "{n}",  # {tag}')
    print("]")


if __name__ == "__main__":
    main()
