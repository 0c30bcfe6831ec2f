"""Benchmarking / evaluation toolkit (the reference's src/ offline tools)."""
