"""Pallas TPU kernels — the production compute path for the hot ops.

Each kernel has an XLA reference implementation next to it (one directory up)
that defines the exact math; kernel unit tests compare against it (the pattern
of the reference's tests/kernels/ suites).
"""
