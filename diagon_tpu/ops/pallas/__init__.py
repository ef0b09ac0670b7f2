"""Pallas TPU kernels for the hot ops."""
