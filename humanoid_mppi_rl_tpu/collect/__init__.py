"""Episode drivers, data-collection orchestration, CSV logging."""

from .logging import TrajectoryLogger  # noqa: F401
from .runner import (  # noqa: F401
    EpisodeResult,
    EpisodeRunner,
    collect_humanoid,
    collect_quadruped,
)
