"""Benchmark harnesses (scaling evidence, A/B measurements)."""
