"""Pallas TPU kernels for the hot inference ops."""
