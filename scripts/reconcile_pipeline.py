"""Reconcile the full-pipeline collection evidence (round-3 VERDICT weak-4).

The committed `artifacts/full_pipeline/collect_metrics.jsonl` is the ground
truth: every collection invocation (two concurrent shards + a follow-up run)
appended its per-episode records there, but `summary.json` was written by a
single shard, so its `collect` block (80 attempts / 26 goals) documented only
part of the 56-episode training set on disk.

This script derives the AGGREGATE accounting from the JSONL and traces every
saved episode CSV in `data/states_ft/` back to its goal-reached episode line
(save-timestamp within 5 s of the episode event, CSV row count == logged
steps), then writes it into `summary.json["collect"]["aggregate"]`.
`tests/test_full_pipeline_artifacts.py::test_every_saved_episode_traced`
asserts the same tracing independently.

Usage: python scripts/reconcile_pipeline.py [--dir artifacts/full_pipeline]
"""

import argparse
import datetime
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_episodes(art_dir):
    with open(os.path.join(art_dir, "collect_metrics.jsonl")) as f:
        events = [json.loads(line) for line in f]
    episodes = [e for e in events if e.get("kind") == "episode"]
    goal_eps = [e for e in episodes if e["goal"]]

    def stamp(t):
        return datetime.datetime.fromtimestamp(t)

    def parse_name(path):
        base = os.path.basename(path)
        ts = base[len("states_"):-len(".csv")]
        return datetime.datetime.strptime(ts, "%Y-%m-%d_%H%M%S")

    csvs = sorted(glob.glob(os.path.join(art_dir, "data", "states_ft", "*.csv")))
    traced = []
    used = set()
    for path in csvs:
        fts = parse_name(path)
        best = None
        for i, e in enumerate(goal_eps):
            if i in used:
                continue
            dt = abs((stamp(e["t"]) - fts).total_seconds())
            if dt <= 5 and (best is None or dt < best[1]):
                best = (i, dt)
        if best is None:
            traced.append({"file": os.path.basename(path), "episode": None})
            continue
        i, dt = best
        used.add(i)
        with open(path) as f:
            rows = sum(1 for _ in f)
        traced.append({
            "file": os.path.basename(path),
            "steps": goal_eps[i]["steps"],
            "csv_rows": rows,
            "rows_match": rows == goal_eps[i]["steps"],
            "dt_s": round(dt, 1),
        })
    return episodes, goal_eps, traced


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "artifacts", "full_pipeline"))
    args = ap.parse_args()

    episodes, goal_eps, traced = trace_episodes(args.dir)
    n_traced = sum(1 for t in traced if t.get("rows_match"))
    agg = {
        "note": ("aggregate over ALL collection invocations recorded in "
                 "collect_metrics.jsonl (two concurrent shards + a follow-up "
                 "run appended to one JSONL); the sibling fields of this "
                 "collect block document the single invocation that wrote "
                 "summary.json"),
        "episodes_attempted": len(episodes),
        "episodes_goal": len(goal_eps),
        "control_steps": sum(e["steps"] for e in episodes),
        "saved_files": len(traced),
        "saved_files_traced": n_traced,
        "files": traced,
    }
    spath = os.path.join(args.dir, "summary.json")
    with open(spath) as f:
        summary = json.load(f)
    summary["collect"]["aggregate"] = agg
    with open(spath, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in agg.items() if k != "files"}, indent=1))


if __name__ == "__main__":
    main()
