"""Pallas TPU kernels for the hot ops (selective scan, fused frontend)."""
