"""Device-mesh scale-out: sample-axis sharding, collectives, multi-host."""

from .mesh import make_mesh, make_sharded_mppi, sharded_update_op  # noqa: F401
