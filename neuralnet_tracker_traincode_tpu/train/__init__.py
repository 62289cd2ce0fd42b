"""Training runtime: jitted DP train step, schedules, SWA, checkpoints, logging."""
