"""Pallas TPU kernels for the postprocessing hot ops."""
