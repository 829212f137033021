"""IO layer: multi-format input sources + deterministic fixtures."""
