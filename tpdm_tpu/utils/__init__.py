"""Utilities: weight conversion, image post-processing, profiling."""
