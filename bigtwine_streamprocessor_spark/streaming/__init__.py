"""Structured Streaming layer: stateful fan-in, sources, progress listeners."""
