"""Unit tests for bench.py's steal-gated scaling legs (no Spark).

The gate protects the north-rule scaling-efficiency evidence from host
noise (VERDICT r2 #2): legs measured during a hypervisor steal storm must
be discarded and re-run, and the recorded JSON must make the gating
auditable. These tests drive _scaling_runs with the leg runner and the
ambient sampler monkeypatched, so the logic is verified without burning
ten-minute Spark legs.
"""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def _leg(rps: float, steal: float, total: float = 100.0) -> dict:
    return {
        "spatial_rows_per_sec": rps,
        "host_steal_pct": steal,
        "total_sec": total,
    }


def _run(monkeypatch, ambient_seq, leg_seq, env=None):
    amb = iter(ambient_seq)
    legs = iter(leg_seq)
    monkeypatch.setattr(bench, "_ambient_steal", lambda secs=4.0: next(amb))
    monkeypatch.setattr(
        bench, "_run_isolated", lambda cpus, sf, **kw: dict(next(legs), cpus=cpus)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    for k, v in (env or {}).items():
        monkeypatch.setenv(k, v)
    monkeypatch.setenv("SPARK_GRAFT_SCALE_REPEATS", "2")
    monkeypatch.setenv("SPARK_GRAFT_CEILING", "0")  # 12s real probe: not here
    return bench._scaling_runs("/tmp/sfX", 8)


def test_gate_clean_run(monkeypatch):
    """All legs under both gates: best-of-K per side, gate_satisfied.
    Slots alternate big/small (storm exposure balanced across sides)."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.2, 0.3, 0.1, 0.4],
        leg_seq=[_leg(1000, 1.0), _leg(300, 0.8), _leg(1200, 0.5), _leg(310, 0.2)],
    )
    assert out["rows_per_sec_big"] == 1200 and out["rows_per_sec_small"] == 310
    assert out["efficiency"] == round((1200 / 310) / 4, 3)
    assert out["gate_satisfied"] is True
    assert len(out["all_legs"]["big"]) == 2
    assert out["all_legs"]["discarded_big"] == []
    # every kept leg carries its audit fields
    for leg in out["all_legs"]["big"] + out["all_legs"]["small"]:
        assert leg["ambient_steal_pct"] <= out["ambient_gate_pct"]
        assert leg["steal_pct"] <= out["steal_gate_pct"]


def test_gate_storm_slot_skipped_and_retried(monkeypatch):
    """Ambient storm: the slot is skipped WITHOUT running a leg, recorded
    as discarded, and a later calm slot replaces it."""
    out = _run(
        monkeypatch,
        # slots: big calm, small calm, big STORM, small calm, big calm
        ambient_seq=[0.2, 0.1, 7.5, 0.2, 0.3],
        leg_seq=[_leg(1000, 1.0), _leg(320, 0.5), _leg(300, 0.7), _leg(1100, 0.9)],
    )
    assert out["rows_per_sec_big"] == 1100
    disc = out["all_legs"]["discarded_big"]
    assert len(disc) == 1 and disc[0]["storm_skipped"] is True
    assert disc[0]["ambient_steal_pct"] == 7.5
    assert out["gate_satisfied"] is True


def test_gate_inrun_cap_discards_leg(monkeypatch):
    """A leg whose in-run steal blows past the loose cap is discarded and
    re-run; the replacement is used."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.2, 0.2, 0.2, 0.2, 0.2],
        leg_seq=[
            _leg(2000, 9.0),  # big: storm mid-leg, discarded
            _leg(300, 0.3),  # small
            _leg(1000, 1.0),  # big
            _leg(290, 0.6),  # small
            _leg(1050, 0.4),  # big (replacement slot)
        ],
    )
    assert out["rows_per_sec_big"] == 1050
    assert out["all_legs"]["discarded_big"][0]["steal_pct"] == 9.0
    assert out["gate_satisfied"] is True


def test_gate_never_satisfied_flags_not_fabricates(monkeypatch):
    """If every attempt fails the in-run cap, the run falls back to the
    contaminated legs but records gate_satisfied=False."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.1] * 12,
        leg_seq=[
            _leg((500 if i % 2 == 0 else 200) + i // 2, 8.0) for i in range(12)
        ],
        env={"SPARK_GRAFT_GATE_RETRIES": "4"},
    )
    assert out["gate_satisfied"] is False
    # still reports a number (best paired ROUND of the fallback legs: big
    # 500..505 / small 200..205 pair round-wise, round 0 maximizes the
    # ratio), clearly flagged
    assert out["rows_per_sec_big"] == 500 and out["rows_per_sec_small"] == 200
    assert out["efficiency_method"] == "paired_rounds_best"


def test_paired_rounds_never_mix_host_windows(monkeypatch):
    """The efficiency must come from ONE round: a fast-window big leg and a
    slow-window small leg from different rounds would flatter the ratio
    (this host's delivered CPU speed drifts in multi-minute windows that
    steal%% cannot see — pairing adjacent legs cancels the drift)."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.1] * 4,
        # round 1: slow window (big 800, small 290); round 2: fast window
        # (big 1200, small 400). Global bests would mix big=1200 with
        # small=290 -> 1.03 "efficiency"; paired rounds cap it at 0.75.
        leg_seq=[
            _leg(800, 0.2),
            _leg(290, 0.1),
            _leg(1200, 0.3),
            _leg(400, 0.2),
        ],
    )
    assert out["efficiency"] == max(
        round((800 / 290) / 4, 3), round((1200 / 400) / 4, 3)
    )
    assert out["efficiency"] < 0.8  # the mixed-window 1.03 must not appear
    assert len(out["rounds"]) == 2
    for r in out["rounds"]:
        assert {"rows_per_sec_big", "rows_per_sec_small", "efficiency"} <= set(r)
