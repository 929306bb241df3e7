"""Scalar / vectorized function library (column expressions + numpy kernels)."""
