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
"""

from __future__ import annotations

import json
import pathlib
import statistics

_ROOT = pathlib.Path(__file__).parent.parent
_RATIO = 2.0
_ABS_DELTA = 0.5  # seconds — sub-second timings are too noisy to gate
# Host-speed shifts outside this band are not plausible co-tenant noise
# on this box (observed round-to-round medians: 0.85x-1.3x). Clamping
# keeps the normalization from absorbing a GENUINE uniform regression —
# e.g. a session-conf change slowing all 300 queries 1.9x would
# otherwise pass the gate as "the host got slower".
_SCALE_BAND = (0.6, 1.8)


def test_no_cross_round_bench_regressions():
    base = json.loads((_ROOT / "BENCH_baseline.json").read_text())
    cur = json.loads((_ROOT / "BENCH_local.json").read_text())
    assert base["sf"] == cur["sf"], (
        f"baseline sf {base['sf']} != bench sf {cur['sf']}: refreeze"
    )
    common = [
        (name, t_old, cur["queries"][name])
        for name, t_old in base["queries"].items()
        if name in cur["queries"]
    ]
    # Host-speed normalization: this box's throughput drifts between
    # rounds (co-tenant CPU steal) — a uniform 1.2-1.3x shift across
    # all 300 queries is the HOST, not 300 regressions. The median
    # per-query ratio estimates that shift robustly (a real regression
    # in a handful of queries cannot move the median of ~300); the
    # gate then flags queries that moved >2x AGAINST the field.
    ratios = [
        t_new / t_old for _, t_old, t_new in common if t_old >= 0.2
    ]
    assert ratios, (
        "no common query with baseline >=0.2s between BENCH_baseline.json "
        "and BENCH_local.json — the artifacts are disjoint; refreeze the "
        "baseline with tools/freeze_bench_baseline.py"
    )
    scale = min(max(statistics.median(ratios), _SCALE_BAND[0]), _SCALE_BAND[1])
    movers = {}
    for name, t_old, t_new in common:
        expected = scale * t_old
        if t_new > _RATIO * expected and t_new - expected > _ABS_DELTA:
            movers[name] = (
                f"{t_old:.2f}s -> {t_new:.2f}s "
                f"({t_new / t_old:.2f}x raw, host-scale {scale:.2f}x)"
            )
    assert not movers, (
        "bench regressions vs BENCH_baseline.json "
        f"(>{_RATIO}x beyond the {scale:.2f}x host-speed shift, "
        f">{_ABS_DELTA}s): {movers} — investigate, then refreeze with "
        "tools/freeze_bench_baseline.py if legitimate"
    )
