"""The sf1 ratio gate (scripts/sweep_sf1.py --check) — VERDICT r12
item 2: the first two registry quadratics were caught only because a
human ran the sweep and read the table; this gate turns the next
silent super-linear regression into a red test instead.

Two layers: the committed sweep record must be green under the gate,
and the gate itself must actually fire on each failure mode."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_spec = importlib.util.spec_from_file_location(
    "sweep_sf1", os.path.join(REPO, "scripts", "sweep_sf1.py")
)
sweep = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(sweep)

RECORD = os.path.join(REPO, "SWEEP_SF1.jsonl")


def _records():
    with open(RECORD) as f:
        return [json.loads(line) for line in f if line.strip()]


def test_committed_sweep_record_passes_gate():
    records = _records()
    assert len(records) >= 200  # the record covers the full registry
    assert sweep.check(records) == []


def test_adjudications_are_real_and_named():
    """Every ADJUDICATED entry must exist in the record, carry a
    non-trivial reason, and actually NEED adjudication for at least
    one of its sanctioned causes (over-gate ratio or engine-only
    parity) — a stale entry would quietly whitelist a future query."""
    by_name = {r["name"]: r for r in _records()}
    for name, reason in sweep.ADJUDICATED.items():
        assert name in by_name, name
        assert len(reason) > 20, name
        r = by_name[name]
        over = (r.get("ratio") or 0) > sweep.RATIO_GATE
        engine_only = str(r.get("parity", "")).startswith("engine-only")
        assert over or engine_only, (name, r.get("ratio"), r.get("parity"))


def test_gate_fires_on_unadjudicated_ratio():
    bad = [{"name": "q", "ratio": sweep.RATIO_GATE + 1, "parity": "pass"}]
    problems = sweep.check(bad)
    assert len(problems) == 1 and "gate" in problems[0]


def test_gate_fires_on_parity_failure_and_error():
    bad = [
        {"name": "a", "ratio": 1.0, "parity": ["rows mismatch"]},
        {"name": "b", "error": "RuntimeError: boom"},
    ]
    problems = sweep.check(bad)
    assert len(problems) == 2
    assert any("parity" in p for p in problems)
    assert any("errored" in p for p in problems)


def test_gate_allows_adjudicated_and_engine_only():
    ok = [
        {
            "name": "fuzzy_name_match",
            "ratio": 40.0,
            "parity": "engine-only (documented quadratic oracle twin)",
        },
        {"name": "x", "ratio": 0.9, "parity": "pass"},
    ]
    assert sweep.check(ok) == []
