"""Pallas TPU kernels and low-level compute ops."""
