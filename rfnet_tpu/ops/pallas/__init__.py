"""Pallas TPU kernels for the hot pairwise-distance scans.

These kernels are the TPU equivalents of the reference's shared-memory-tiled
CUDA kernels (512-pt tiles in `pc_distance/tf_nndistance.cu:6-14`, 1024-pt
tiles in `tf_approxmatch.cu:11,35`): blocks of the query cloud stream through
VMEM while a running min / running sum is kept on-chip, so the full (n, m)
distance matrix never touches HBM.
"""
