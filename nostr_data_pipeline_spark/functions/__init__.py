"""Scalar/vectorized functions: content fingerprinting, extraction, metrics."""
