"""Deterministic (seeded) synthetic data for tests and benchmarks."""
