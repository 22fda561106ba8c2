"""Operational tooling: artifact-builder CLI, memory/performance profiler."""
