"""Record the round-5 Go1 estimator causal-chain diagnostics into
artifacts/quad_pipeline/summary.json (gated by
tests/test_quad_pipeline_artifacts.py; narrative in PERF.md 'Go1 estimator
round 5'). Numbers are the measured results of this round's control
experiments — re-run their scripts to regenerate:

  scripts/dev_quad_cost_truth.py       truth-control at the old op point
  (open-loop probes: inline snippets recorded in PROGRESS / PERF.md)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIAG = {
    "truth_control_old_operating_point": {
        # the r4 gait estimator cost at the r4 operating point (replace
        # mode, zero-seeded plan, sigma 0.4, K=2048, T=25) drifts backward
        # ON TRUE DYNAMICS -> the surrogate was exonerated at that point
        "x_progress_m": -0.179, "steps": 200, "z_min": 0.27,
        "script": "scripts/dev_quad_cost_truth.py",
    },
    "open_loop_probes": {
        # 32-step open-loop x-motion prediction vs truth on real trot
        # windows (per checkpoint generation)
        "full37_rollout_k8": {"x_pred_range": [-0.15, 0.30],
                              "x_true_range": [0.011, 0.032],
                              "eval_loss": 1.56},
        "qpos19_rollout_k8": {"x_pred_range": [0.069, 0.154],
                              "x_true_range": [0.014, 0.032],
                              "eval_loss": 0.0033},
        "qpos19_ego_rollout_k8": {"eval_loss": 0.0025},
    },
    "closed_loop_ladder_m_per_200_steps": {
        "r4_one_step_full37": -0.2546,
        "r5_full37_rollout_k8": -0.2197,
        "r5_qpos19_home_seeded_accumulate": -0.0771,
        "r5_qpos19_proven_cost_T32": -0.1178,
        "r5_qpos19_ego": -0.1682,
    },
    "binding_constraint": (
        "FD-velocity signal-to-noise at the Go1 dt=0.002: per-step true "
        "root dx ~0.9 mm at trot speed vs model per-step x noise of "
        "several mm -> the velocity-tracking cost term cannot "
        "discriminate samples (SNR ~0.1; the humanoid works at dt=0.005 "
        "where the same recipe has SNR ~1-3). Named next contract: "
        "velocity-supervised targets (predict qvel alongside qpos) or a "
        "frame-skip surrogate (predict 5-step deltas)."),
}


def main():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "quad_pipeline",
        "summary.json")
    s = json.load(open(path))
    s["estimator_diagnostics"] = DIAG
    json.dump(s, open(path, "w"), indent=1)
    print("recorded estimator_diagnostics into", path)


if __name__ == "__main__":
    main()
