"""Pallas TPU kernels (with XLA fallbacks for CPU test meshes)."""
