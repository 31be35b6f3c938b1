"""Benchmark + oracle scripts (also importable for tests)."""
