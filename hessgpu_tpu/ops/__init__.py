"""Compute kernels (jnp reference implementations + Pallas TPU kernels)."""
