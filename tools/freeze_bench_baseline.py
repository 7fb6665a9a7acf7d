"""Freeze the current BENCH_local.json per-query timings as the
regression baseline for the NEXT round.

Run at round end, AFTER the bench regen and AFTER investigating any
movers `tests/test_bench_regression.py` flagged — freezing first would
blind the gate to the very regression it exists to catch (the q39 case:
a 2.2x slide that round 5 only found because the judge dug the
per-query map out of git history).

    python tools/freeze_bench_baseline.py [note]
"""

from __future__ import annotations

import json
import subprocess
import sys


def main() -> int:
    d = json.load(open("BENCH_local.json"))
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    note = sys.argv[1] if len(sys.argv) > 1 else f"commit {head}"
    out = {
        "_comment": "Per-query bench baseline frozen from the previous "
        "round's BENCH_local.json (cache-cleared timings, sf0.1). "
        "tests/test_bench_regression.py flags queries >2x baseline "
        "with >0.5s absolute delta; refreeze with "
        "tools/freeze_bench_baseline.py after investigating movers.",
        "frozen_from": note,
        "sf": d["sf"],
        "queries": d["queries"],
    }
    json.dump(out, open("BENCH_baseline.json", "w"), indent=1, sort_keys=True)
    print(f"froze {len(d['queries'])} query timings ({note})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
