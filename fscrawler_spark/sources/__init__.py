"""Sources — external-format ingestion into the engine's tables."""
