"""JAX/Pallas compute kernels: the TPU-native hot path."""
