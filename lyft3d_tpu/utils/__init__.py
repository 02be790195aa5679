"""Profiling, progress, visualization utilities."""
