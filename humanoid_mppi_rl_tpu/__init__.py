"""humanoid_mppi_rl_tpu: a TPU-native MPPI trajectory-optimization and
dynamics-learning framework.

Rebuilds the capability surface of SheffieldWang616/Humanoid_MPPI-RL
(sampling-based MPC over MuJoCo robots + learned-dynamics training) as an
idiomatic JAX/XLA/Pallas/pjit stack:

- ``physics``:   a JAX-native rigid-body engine (Featherstone dynamics +
                 compliant contacts) compiled by XLA to TPU, replacing the
                 reference's MuJoCo C stepping (reference src/*_mppi.* scripts).
- ``solver``:    the MPPI solver core (sample -> rollout -> cost -> exponential
                 weighting -> control update -> receding-horizon shift), one
                 parameterized engine replacing ~12 copy-pasted scripts.
- ``costs``:     per-task cost libraries (cartpole, hopper, go1 quadruped,
                 humanoid) mirroring reference cost terms.
- ``models``:    Flax surrogate-dynamics families (MLP, feature-attention,
                 cross-attention) mirroring reference learning/model.py.
- ``learning``:  datasets, optax training loops, orbax checkpointing.
- ``collect``:   episode drivers + reference-compatible CSV trajectory logging.
- ``parallel``:  device-mesh scale-out of the sample axis (shard_map + psum).
- ``ops``:       Pallas TPU kernels for the MPPI weighting/update hot path.
"""

__version__ = "0.1.0"
