"""Training runtime: config, registries, schedules, train state, checkpoints, logging."""
