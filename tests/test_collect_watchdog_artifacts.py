"""Committed watchdog-collection evidence (round-3 VERDICT weak-6).

Round 3's collection burned 2/3 of wall clock on doomed episodes: 54/80
attempts ran the full 2,500-step cap (74 steps/s amortized vs 195
in-chunk). artifacts/collect_watchdog/ is a TPU re-run with the
progress watchdog armed (no 0.05 m goal-distance improvement over 800
control steps -> abandon) and the round-4 strided walk preset.
"""

import json
import os

import numpy as np
import pytest

DIR = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                   "collect_watchdog")


def _summary():
    path = os.path.join(DIR, "summary.json")
    if not os.path.exists(path):
        pytest.skip("collect_watchdog artifacts not committed")
    with open(path) as f:
        return json.load(f)


def test_amortized_throughput_and_goal_rate():
    s = _summary()
    # round-3 ask: amortized >= 150 steps/s at an unchanged-or-better goal
    # rate (baseline: 74.4 steps/s post-startup, 26/80 = 32.5%). The
    # jsonl accounting spans first-to-last metrics event over ALL attempts
    # incl. retries (the one-time program compile inside wall_s excluded,
    # same basis as the r3 baseline) — re-derived from the raw JSONL below.
    acc = s["jsonl_accounting"]
    assert acc["steps_per_s"] >= 150.0, acc
    assert s["goal_rate"] >= s["baseline_r3"]["goal_rate"], s["goal_rate"]
    assert s["episodes_attempted"] >= 30
    # re-derive from the raw events
    eps = []
    with open(os.path.join(DIR, "collect_metrics.jsonl")) as f:
        events = [json.loads(line) for line in f]
    eps = [e for e in events if e.get("kind") == "episode"]
    steps = sum(e["steps"] for e in eps)
    span = events[-1]["t"] - events[0]["t"]
    assert abs(steps / span - acc["steps_per_s"]) < 1.0
    assert steps == acc["control_steps"]


def test_watchdog_actually_fired_or_was_unneeded():
    """The JSONL must show either stalled episodes cut short (the watchdog
    working) or no episode burning the full cap without reaching a goal
    (nothing for it to cut)."""
    s = _summary()
    path = os.path.join(DIR, "collect_metrics.jsonl")
    eps = []
    with open(path) as f:
        for line in f:
            d = json.loads(line)
            if d.get("kind") == "episode":
                eps.append(d)
    assert len(eps) >= s["episodes_attempted"]
    stalled = [e for e in eps if e.get("stalled")]
    capped_failures = [e for e in eps
                       if not e["goal"] and not e["fell"]
                       and not e.get("stalled")
                       and e["steps"] >= s["max_steps"]]
    assert stalled or not capped_failures, (len(stalled),
                                            len(capped_failures))
