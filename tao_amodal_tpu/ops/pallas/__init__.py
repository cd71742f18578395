"""Pallas TPU kernels for the ops XLA doesn't fuse well."""
