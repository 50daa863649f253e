"""tpu-go-icp: TPU-native globally-optimal point-cloud registration.

A from-scratch JAX/XLA/Pallas implementation of the Go-ICP capability set of
the CUDA reference (solemnwind/fast-go-icp): nested branch-and-bound over
SE(3) with distance-field bounds and Procrustes ICP refinement, built
TPU-first (device frontiers, batched bound kernels, mesh sharding).
"""

__version__ = "0.1.0"
