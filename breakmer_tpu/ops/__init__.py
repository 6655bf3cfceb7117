"""Device kernels: k-mer engine and wavefront Smith-Waterman.

This package is the TPU replacement for the reference's external native
binaries (SURVEY.md §2a): Jellyfish -> ops.kmer (XLA-level by design —
see the kmer module docstring); BLAT's alignment DP -> ops.sw /
ops.sw_pallas.
"""
