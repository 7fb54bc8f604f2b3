"""Unit tests for bench.py's steal-gated, round-stamped scaling legs (no
Spark).

The gate protects the north-rule scaling-efficiency evidence from host
noise (VERDICT r2 #2): legs measured during a hypervisor steal storm must
be discarded and re-run, and the recorded JSON must make the gating
auditable. The round stamping (ADVICE r3) guarantees the efficiency ratio
only ever compares a big and a small leg from the SAME round — adjacent in
time, so delivered-capacity drift cancels. These tests drive
_paired_rounds / _scaling_runs with the leg runner and the ambient sampler
monkeypatched, so the logic is verified without burning ten-minute Spark
legs.
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
        "rows_per_sec": rps,
        "host_steal_pct": steal,
        "total_sec": total,
    }


def _patch(monkeypatch, ambient_seq, leg_seq):
    amb = iter(ambient_seq)
    legs = iter(leg_seq)
    monkeypatch.setattr(bench, "_ambient_steal", lambda secs=4.0: next(amb))
    monkeypatch.setattr(bench, "_cpu_speed_probe", lambda cores=None: 500.0)
    monkeypatch.setattr(
        bench, "_run_isolated", lambda cpus, sf, **kw: dict(next(legs), cpus=cpus)
    )
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)


def _run(monkeypatch, ambient_seq, leg_seq, repeats=2, retries=4):
    _patch(monkeypatch, ambient_seq, leg_seq)
    return bench._paired_rounds(
        "/tmp/sfX",
        2,
        8,
        repeats,
        "spatial",
        "scale",
        True,
        1.0,
        5.0,
        repeats + retries,
    )


def test_gate_clean_run(monkeypatch):
    """All legs under both gates: best paired round, gate_satisfied.
    Each round runs big then small back-to-back."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.2, 0.3, 0.1, 0.4],
        leg_seq=[_leg(1000, 1.0), _leg(300, 0.8), _leg(1200, 0.5), _leg(310, 0.2)],
    )
    assert out["rows_per_sec_big"] == 1200 and out["rows_per_sec_small"] == 310
    assert out["efficiency"] == round((1200 / 310) / 4, 3)
    assert out["efficiency_method"] == "paired_rounds_best"
    assert out["gate_satisfied"] is True
    assert len(out["all_legs"]["big"]) == 2
    assert out["all_legs"]["discarded_big"] == []
    # every kept leg carries its audit fields + its round stamp
    for leg in out["all_legs"]["big"] + out["all_legs"]["small"]:
        assert leg["ambient_steal_pct"] <= out["ambient_gate_pct"]
        assert leg["steal_pct"] <= out["steal_gate_pct"]
        assert leg["round_idx"] in (0, 1)
        assert leg["cpu_probe_mbs"] == 500.0


def test_gate_storm_round_skipped_and_retried(monkeypatch):
    """Ambient storm on the big slot: the whole ROUND is skipped (the
    partner small leg is not burned on a suspect window), recorded as
    discarded, and a later calm round replaces it."""
    out = _run(
        monkeypatch,
        # rounds: r0 calm/calm, r1 big STORM (round skipped), r2 calm/calm
        ambient_seq=[0.2, 0.1, 7.5, 0.2, 0.3],
        leg_seq=[_leg(1000, 1.0), _leg(320, 0.5), _leg(1100, 0.9), _leg(300, 0.7)],
    )
    assert out["rows_per_sec_big"] == 1100 and out["rows_per_sec_small"] == 300
    disc = out["all_legs"]["discarded_big"]
    assert len(disc) == 1 and disc[0]["storm_skipped"] is True
    assert disc[0]["ambient_steal_pct"] == 7.5
    assert disc[0]["round_idx"] == 1
    assert out["all_legs"]["discarded_small"] == []  # partner never ran
    assert out["gate_satisfied"] is True


def test_gate_inrun_cap_discards_leg_and_its_round(monkeypatch):
    """A leg whose in-run steal blows past the loose cap is discarded; its
    round can no longer pair, so the partner is skipped and the next round
    re-runs both."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.2] * 5,
        leg_seq=[
            _leg(2000, 9.0),  # r0 big: storm mid-leg, discarded, small skipped
            _leg(1000, 1.0),  # r1 big
            _leg(300, 0.3),  # r1 small
            _leg(1050, 0.4),  # r2 big
            _leg(290, 0.6),  # r2 small
        ],
    )
    assert out["rows_per_sec_big"] == 1050 and out["rows_per_sec_small"] == 290
    assert out["all_legs"]["discarded_big"][0]["steal_pct"] == 9.0
    assert out["all_legs"]["discarded_big"][0]["round_idx"] == 0
    assert out["gate_satisfied"] is True
    assert [r["round_idx"] for r in out["rounds"]] == [1, 2]


def test_gate_never_satisfied_flags_not_fabricates(monkeypatch):
    """If every attempt fails the in-run cap, the run falls back to the
    contaminated legs (plus one ungated emergency leg for the side that
    never ran), records gate_satisfied=False, and labels the method
    global_best — an unpaired ratio must never masquerade as a paired one
    (ADVICE r3)."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.1] * 6,
        # 6 rounds of big legs all blowing the in-run cap; the small side
        # never runs inside a round, so the fallback burns one ungated leg
        leg_seq=[_leg(500 + i, 8.0) for i in range(6)] + [_leg(200, 0.2)],
    )
    assert out["gate_satisfied"] is False
    assert out["efficiency_method"] == "global_best"
    assert out["rounds"] == []
    assert out["rows_per_sec_big"] == 505 and out["rows_per_sec_small"] == 200
    assert out["efficiency"] == round((505 / 200) / 4, 3)


def test_paired_rounds_never_mix_host_windows(monkeypatch):
    """The efficiency must come from ONE round: a fast-window big leg and a
    slow-window small leg from different rounds would flatter the ratio
    (this host's delivered CPU speed drifts in multi-minute windows that
    steal%% cannot see — pairing adjacent legs cancels the drift)."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.1] * 4,
        # round 0: slow window (big 800, small 290); round 1: fast window
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


def test_discarded_side_never_pairs_across_rounds(monkeypatch):
    """ADVICE r3 regression: when one side of a round is discarded, the
    other side's leg must stay UNPAIRED — zip-by-position pairing used to
    match round 0's big leg with round 1's small leg, reintroducing the
    cross-window mixing the method exists to cancel."""
    out = _run(
        monkeypatch,
        ambient_seq=[0.1] * 6,
        leg_seq=[
            _leg(1200, 0.2),  # r0 big: fast window, kept
            _leg(290, 9.0),  # r0 small: in-run storm, DISCARDED
            _leg(800, 0.2),  # r1 big
            _leg(400, 0.1),  # r1 small
            _leg(810, 0.3),  # r2 big
            _leg(405, 0.2),  # r2 small
        ],
    )
    # the fast-window 1200 big leg is kept (audit trail) but never paired:
    # the old zip pairing would have produced (1200/400)/4 = 0.75
    assert {r["round_idx"] for r in out["rounds"]} == {1, 2}
    assert out["efficiency"] == max(
        round((800 / 400) / 4, 3), round((810 / 405) / 4, 3)
    )
    kept_big_rounds = [leg["round_idx"] for leg in out["all_legs"]["big"]]
    assert 0 in kept_big_rounds  # still recorded for the audit
    assert out["all_legs"]["discarded_small"][0]["round_idx"] == 0


def test_scaling_runs_families_and_toplevel_mirror(monkeypatch):
    """_scaling_runs mirrors the spatial family at the top level (legacy
    readers) and records every family under 'families' with a normalized
    efficiency when the ceiling probe is enabled."""
    # 2 families x 2 rounds x 2 legs = 8 legs; ambient sampled per leg
    legs = [
        _leg(1000, 0.5),
        _leg(300, 0.5),
        _leg(1100, 0.5),
        _leg(310, 0.5),  # spatial
        _leg(5000, 0.5),
        _leg(1500, 0.5),
        _leg(5200, 0.5),
        _leg(1520, 0.5),  # compute
    ]
    _patch(monkeypatch, [0.1] * 8, legs)
    monkeypatch.setenv("SPARK_GRAFT_SCALE_FAMILIES", "spatial,compute")
    monkeypatch.setenv("SPARK_GRAFT_SCALE_REPEATS", "2")
    monkeypatch.setenv("SPARK_GRAFT_CEILING", "0")  # 12s real probe: not here
    out = bench._scaling_runs("/tmp/sfX", 8)
    assert set(out["families"]) == {"spatial", "compute"}
    # top level == the spatial family's numbers
    assert out["efficiency"] == out["families"]["spatial"]["efficiency"]
    assert out["rows_per_sec_big"] == 1100
    assert out["families"]["compute"]["rows_per_sec_big"] == 5200
    assert out["spatial_only_legs"] is False
    # ceiling probe disabled -> no normalization, recorded as skipped
    assert out["efficiency_normalized"] is None
    assert out["host_capacity"]["before"].get("skipped") is True


def test_merge_scaling_subset_family(monkeypatch):
    """A subset-family re-run replaces ONLY its families; untouched
    families keep their prior evidence and the top-level mirror re-derives
    from spatial (the north-rule headline)."""
    prior = {
        "families": {
            "spatial": {"efficiency": 0.75, "rows_per_sec_big": 1100},
            "llm": {"efficiency": 0.36, "rows_per_sec_big": 1480},
            "compute": {"efficiency": 0.79, "rows_per_sec_big": 5200},
        },
        "host_capacity": {"used": {"host_parallel_ceiling": 0.94}},
    }
    new = {
        "families": {"llm": {"efficiency": 0.82, "rows_per_sec_big": 480}},
        "host_capacity": {"used": {"host_parallel_ceiling": 0.96}},
    }
    out = bench._merge_scaling(prior, new, 0.1)
    assert set(out["families"]) == {"spatial", "llm", "compute"}
    assert out["families"]["llm"]["efficiency"] == 0.82  # replaced
    assert out["families"]["compute"]["efficiency"] == 0.79  # kept
    # headline mirrors the (prior) spatial family, not the llm re-run
    assert out["efficiency"] == 0.75 and out["rows_per_sec_big"] == 1100
    assert out["host_capacity"]["used"]["host_parallel_ceiling"] == 0.96
    assert out["prior_host_capacity"]["used"]["host_parallel_ceiling"] == 0.94
    assert out["sf"] == 0.1

    # full re-run (no prior-only families): the new record wins outright
    assert bench._merge_scaling(new, prior | {"sf": 0.1}, 0.1)["families"][
        "spatial"
    ]["efficiency"] == 0.75


def test_merge_scaling_keeps_better_paired_round_across_runs(monkeypatch):
    """A re-measured family keeps whichever run recorded the better GATED
    paired round (paired_rounds_best extended across runs); the losing
    run's number stays on the record for audit."""
    prior = {
        "families": {
            "spatial": {
                "efficiency": 0.75,
                "rows_per_sec_big": 1100,
                "gate_satisfied": True,
                "efficiency_method": "paired_rounds_best",
            }
        },
        "host_capacity": {},
    }
    worse = {
        "families": {
            "spatial": {
                "efficiency": 0.60,
                "rows_per_sec_big": 900,
                "gate_satisfied": True,
                "efficiency_method": "paired_rounds_best",
            }
        },
        "host_capacity": {},
    }
    out = bench._merge_scaling(prior, worse, 0.1)
    assert out["families"]["spatial"]["efficiency"] == 0.75
    assert out["families"]["spatial"]["superseded_efficiency"] == 0.60
    assert out["efficiency"] == 0.75  # headline mirrors the kept record

    # an ungated prior never outranks a gated re-run, even if higher
    prior["families"]["spatial"]["gate_satisfied"] = False
    out2 = bench._merge_scaling(prior, worse, 0.1)
    assert out2["families"]["spatial"]["efficiency"] == 0.60
