"""Structured Streaming jobs with batch-equivalent formulations."""
