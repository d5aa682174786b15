"""Task registry and environment drivers."""

from .tasks import TASKS, TaskSpec, load_task  # noqa: F401
