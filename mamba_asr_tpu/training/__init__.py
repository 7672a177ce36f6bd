"""Training services: losses, schedules, normalization, metrics,
checkpointing, logging, and the pjit train loop."""
