"""Config, profiling, serialization helpers."""
