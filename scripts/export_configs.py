"""Export the task registry to configs/*.json (human-readable mirrors of the
presets in envs/tasks.py — the reference's per-script constants table)."""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from humanoid_mppi_rl_tpu.envs.tasks import TASKS


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    os.makedirs(out_dir, exist_ok=True)
    for name, spec in TASKS.items():
        d = {
            "task": spec.name,
            "asset": spec.asset,
            "mppi": dataclasses.asdict(spec.mppi),
            "cost_kwargs": spec.cost_kwargs,
            "init_qpos": list(spec.init_qpos) if spec.init_qpos else None,
            "init_keyframe": spec.init_keyframe,
            "clamp_ctrl_to_range": spec.clamp_ctrl_to_range,
            "ctrl_clamp_abs": spec.ctrl_clamp_abs,
            "kernel_cost": spec.kernel_cost,
        }
        with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
            json.dump(d, f, indent=2, default=str)
    print(f"wrote {len(TASKS)} configs to {out_dir}")


if __name__ == "__main__":
    main()
