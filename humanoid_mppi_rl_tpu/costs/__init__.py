"""Per-task MPPI cost libraries (reference L4 layer).

Each module exposes factory functions returning `cost(state, ctrl, t)` /
`terminal(state, t)` closures compatible with solver.mppi. All costs are pure
jnp on the rollout's own state — fixing the reference's global-data gait-term
caveat (SURVEY.md §3.1): humanoid body positions/velocities come from the
rollout state, not the outer sim.
"""

from . import cartpole, hopper, humanoid, quadruped  # noqa: F401
