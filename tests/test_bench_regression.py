"""Cross-round bench regression gate (round-5 verdict task 4).

Compares the committed BENCH_local.json (this round's cache-cleared
per-query timings) against BENCH_baseline.json (frozen from the prior
round by tools/freeze_bench_baseline.py). A query that got >2x slower
with >0.5s absolute delta fails here IN-ROUND instead of being found by
the next judge two rounds later (the q39 case: 1.62s -> 3.58s landed in
round 5 and was only caught by digging the full map out of git
history).

On a legitimate mover (new machinery that is genuinely worth the cost,
or a methodology change), fix or document it, then refreeze the
baseline — the gate's job is to force that conversation, not to forbid
movement. New queries (absent from the baseline) are exempt until the
next freeze.

The mover math (median host-speed normalization clamped to a sane
band, >RATIOx against the field with >ABS_DELTA absolute) lives in
tools/freeze_bench_baseline.py and is imported here — the in-round
gate and the refreeze guard must share ONE definition, or a query one
passes can block (or silently sail through) the other.
"""

from __future__ import annotations

import importlib.util
import json
import pathlib

_ROOT = pathlib.Path(__file__).parent.parent


def _load_tool():
    spec = importlib.util.spec_from_file_location(
        "freeze_bench_baseline", _ROOT / "tools" / "freeze_bench_baseline.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_cross_round_bench_regressions():
    tool = _load_tool()
    base = json.loads((_ROOT / "BENCH_baseline.json").read_text())
    cur = json.loads((_ROOT / "BENCH_local.json").read_text())
    assert base["sf"] == cur["sf"], (
        f"baseline sf {base['sf']} != bench sf {cur['sf']}: refreeze"
    )
    # Host-speed normalization: this box's throughput drifts between
    # rounds (co-tenant CPU steal) — a uniform 1.2-1.3x shift across
    # all 300 queries is the HOST, not 300 regressions. The tool's
    # movers_against_field estimates that shift from the median
    # per-query ratio (clamped so a GENUINE uniform regression can't
    # hide as "the host got slower") and flags queries that moved
    # >2x AGAINST the field with >0.5s absolute delta.
    assert any(
        t_old >= tool._MIN_BASE
        for name, t_old in base["queries"].items()
        if name in cur["queries"]
    ), (
        f"no common query with baseline >={tool._MIN_BASE}s between "
        "BENCH_baseline.json and BENCH_local.json — the artifacts are "
        "disjoint; refreeze the baseline with tools/freeze_bench_baseline.py"
    )
    movers = tool.movers_against_field(base["queries"], cur["queries"])
    assert not movers, (
        "bench regressions vs BENCH_baseline.json "
        f"(>{tool._RATIO}x beyond the median host-speed shift, "
        f">{tool._ABS_DELTA}s): {movers} — investigate, then refreeze "
        "with tools/freeze_bench_baseline.py if legitimate"
    )
