"""Host-side utilities: config, datasets, trajectory IO, timing."""
