"""Unit tests for the bench drift gate (scripts/bench_drift.py) — the
pure verdict function bench.py embeds into BENCH_detail.json and the
machine-load triage note (round-8 VERDICT #2/#3: drift evidence must
live in the artifact, adjudicated by code, not re-litigated by hand)."""
from __future__ import annotations

import os
import sys

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"),
)

from bench_drift import _load_note, gate_queries  # noqa: E402


def test_gate_passes_within_noise():
    old = {"a": 1.0, "b": 2.0, "c": 0.1}
    new = {"a": 1.05, "b": 1.96, "c": 0.14}  # c +40% but under abs floor
    g = gate_queries(old, new)
    assert g["pass"] is True and g["verdict"] == "pass"
    assert g["exceeders"] == [] and g["common"] == 3


def test_gate_fails_on_real_regression_and_reports_direction():
    old = {"a": 2.0, "b": 2.0, "c": 2.0}
    new = {"a": 3.0, "b": 2.9, "c": 2.0}
    g = gate_queries(old, new)
    assert g["pass"] is False and g["slower"] == 2 and g["faster"] == 0
    assert g["one_directional"] is True
    assert g["exceeders"][0]["query"] == "a"  # sorted by |pct|


def test_gate_dominance_allows_noise_flips():
    # 10 slower + 1 faster is still the load signature (round-8 driver
    # run: 36/2); a 50/50 split is not
    old = {f"q{i}": 2.0 for i in range(11)}
    new = {f"q{i}": 3.0 for i in range(10)}
    new["q10"] = 1.0
    g = gate_queries(old, new)
    assert g["one_directional"] is True
    mixed = {f"q{i}": (3.0 if i < 5 else 1.0) for i in range(10)}
    assert gate_queries({f"q{i}": 2.0 for i in range(10)}, mixed)[
        "one_directional"
    ] is False


def test_gate_total_only_drift_fails():
    # every query +6%: no per-query exceeder but total blows the 5% gate
    old = {f"q{i}": 10.0 for i in range(5)}
    new = {f"q{i}": 10.6 for i in range(5)}
    g = gate_queries(old, new)
    assert g["exceeders"] == [] and g["pass"] is False


def test_gate_common_set_ignores_registry_growth():
    g = gate_queries({"a": 1.0}, {"a": 1.0, "new_op": 50.0})
    assert g["common"] == 1 and g["pass"] is True


def test_load_note_fires_only_with_elevated_load():
    g = {"one_directional": True, "slower": 12, "faster": 1}
    old_art = {"loadavg_start": [1.5, 1.0, 1.0]}
    hot = {"loadavg_start": [4.2, 3.0, 3.0]}
    note = _load_note(g, old_art, hot)
    assert note and "machine-load" in note and "4.20" in note
    # same or lower load: no note — the drift needs another explanation
    assert _load_note(g, old_art, {"loadavg_start": [1.2, 1.0, 1.0]}) is None
    # mixed-direction drift: no note
    g2 = {"one_directional": False, "slower": 5, "faster": 5}
    assert _load_note(g2, old_art, hot) is None
    # artifacts without load fields (old rounds): no note, no crash
    assert _load_note(g, {}, hot) is None
