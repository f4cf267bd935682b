from detectax.train import checkpoint, losses, loop, metrics, schedules  # noqa: F401
