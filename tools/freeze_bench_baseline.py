"""Freeze the current BENCH_local.json per-query timings as the
regression baseline for the NEXT round.

Run at round end, AFTER the bench regen and AFTER investigating any
movers `tests/test_bench_regression.py` flagged — freezing first would
blind the gate to the very regression it exists to catch (the q39 case:
a 2.2x slide that round 5 only found because the judge dug the
per-query map out of git history).

The tool REFUSES to refreeze while any query is >2x against the field
vs the OUTGOING baseline unless each such mover carries an adjudication
note (the q40 case: the round-6 refreeze silently baked in a 2.04x
against-field mover that was never individually examined). Notes are
given on the command line and recorded in the frozen JSON so the
refreeze commit itself carries the evidence:

    python tools/freeze_bench_baseline.py [note] \
        [--adjudicate qNNN_name="isolated 1.2s, host noise" ...]
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys

_RATIO = 2.0
_ABS_DELTA = 0.5  # seconds — sub-second timings are too noisy to gate
_SCALE_BAND = (0.6, 1.8)
_MIN_BASE = 0.2  # seconds — queries under this don't inform the host scale


def movers_against_field(
    base_queries: dict[str, float], cur_queries: dict[str, float]
) -> dict[str, str]:
    """Queries >_RATIOx slower than the median host-speed shift predicts
    (same math as tests/test_bench_regression.py)."""
    common = [
        (name, t_old, cur_queries[name])
        for name, t_old in base_queries.items()
        if name in cur_queries
    ]
    ratios = [t_new / t_old for _, t_old, t_new in common if t_old >= _MIN_BASE]
    if not ratios:
        return {}
    scale = min(max(statistics.median(ratios), _SCALE_BAND[0]), _SCALE_BAND[1])
    out = {}
    for name, t_old, t_new in common:
        expected = scale * t_old
        if t_new > _RATIO * expected and t_new - expected > _ABS_DELTA:
            out[name] = (
                f"{t_old:.2f}s -> {t_new:.2f}s "
                f"({t_new / t_old:.2f}x raw, host-scale {scale:.2f}x)"
            )
    return out


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    adjudications: dict[str, str] = {}
    positional: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--adjudicate":
            i += 1
            if i >= len(argv):
                print("--adjudicate needs qNNN=note, got nothing")
                return 2
            a = argv[i]
            name, _, note = a.partition("=")
            if not note:
                print(f"--adjudicate needs qNNN=note, got {a!r}")
                return 2
            adjudications[name] = note
        else:
            positional.append(a)
        i += 1

    d = json.load(open("BENCH_local.json"))
    try:
        old = json.load(open("BENCH_baseline.json"))
    except FileNotFoundError:
        old = {"queries": {}}
    movers = movers_against_field(old.get("queries", {}), d["queries"])
    unadjudicated = {k: v for k, v in movers.items() if k not in adjudications}
    if unadjudicated:
        print(
            "REFUSING to refreeze: queries moved >2x against the field vs "
            "the outgoing baseline without an adjudication note:"
        )
        for name, detail in sorted(unadjudicated.items()):
            print(f"  {name}: {detail}")
        print(
            "Investigate each (bench.py --isolate), then rerun with "
            '--adjudicate qNNN_name="evidence" per mover.'
        )
        return 1

    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True,
        text=True,
    ).stdout.strip()
    note = positional[0] if positional else f"commit {head}"
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
    if movers:
        out["adjudicated_movers"] = {
            name: {"moved": movers[name], "note": adjudications[name]}
            for name in sorted(movers)
        }
    json.dump(out, open("BENCH_baseline.json", "w"), indent=1, sort_keys=True)
    print(
        f"froze {len(d['queries'])} query timings ({note}); "
        f"{len(movers)} adjudicated mover(s)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
