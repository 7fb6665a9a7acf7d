"""tools/freeze_bench_baseline.py refreeze guard (round-6 verdict
task 2): the tool must REFUSE to refreeze while any query moved >2x
against the field vs the OUTGOING baseline without a per-mover
adjudication note — the loophole that let round 6 bake the q40 mover
into the new baseline unexamined. No Spark session involved: the tool
is pure JSON-in/JSON-out, tested in a scratch cwd via subprocess-free
direct calls (monkeypatched cwd)."""

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


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def _setup(tmp_path, monkeypatch, base_q, cur_q):
    monkeypatch.chdir(tmp_path)
    _write(tmp_path, "BENCH_baseline.json", {"sf": 0.1, "queries": base_q})
    _write(tmp_path, "BENCH_local.json", {"sf": 0.1, "queries": cur_q})


# A field of steady queries so the median host-scale is 1.0; one mover
# at 3x with >0.5s absolute delta trips the same math as the gate test.
_STEADY = {f"q{i:03d}_steady": 1.0 for i in range(20)}


def test_movers_against_field_math():
    mod = _load_tool()
    cur = dict(_STEADY)
    cur["q040_mover"] = 3.0
    movers = mod.movers_against_field({**_STEADY, "q040_mover": 1.0}, cur)
    assert list(movers) == ["q040_mover"]
    # sub-threshold movement is not a mover
    cur["q040_mover"] = 1.4
    assert mod.movers_against_field({**_STEADY, "q040_mover": 1.0}, cur) == {}


def test_refuses_unadjudicated_mover(tmp_path, monkeypatch):
    mod = _load_tool()
    _setup(
        tmp_path,
        monkeypatch,
        {**_STEADY, "q040_mover": 1.0},
        {**_STEADY, "q040_mover": 3.0},
    )
    assert mod.main([]) == 1
    # refusal must leave the outgoing baseline untouched
    frozen = json.loads((tmp_path / "BENCH_baseline.json").read_text())
    assert frozen["queries"]["q040_mover"] == 1.0


def test_adjudicated_mover_freezes_with_note(tmp_path, monkeypatch):
    mod = _load_tool()
    _setup(
        tmp_path,
        monkeypatch,
        {**_STEADY, "q040_mover": 1.0},
        {**_STEADY, "q040_mover": 3.0},
    )
    rc = mod.main(
        ["r7", "--adjudicate", "q040_mover=isolated run matches; host stall"]
    )
    assert rc == 0
    frozen = json.loads((tmp_path / "BENCH_baseline.json").read_text())
    assert frozen["queries"]["q040_mover"] == 3.0
    adj = frozen["adjudicated_movers"]["q040_mover"]
    assert adj["note"] == "isolated run matches; host stall"
    assert "3.00" in adj["moved"]


def test_clean_field_freezes_without_notes(tmp_path, monkeypatch):
    mod = _load_tool()
    _setup(tmp_path, monkeypatch, dict(_STEADY), dict(_STEADY))
    assert mod.main(["r7"]) == 0
    frozen = json.loads((tmp_path / "BENCH_baseline.json").read_text())
    assert frozen["frozen_from"] == "r7"
    assert "adjudicated_movers" not in frozen
