"""Pallas TPU kernels for the hot ops (fused NeRF MLP ray-march path)."""
