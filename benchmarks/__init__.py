"""The five BASELINE.md benchmark configs (see benchmarks/run.py)."""
