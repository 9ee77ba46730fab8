"""Compute kernels (jnp reference paths + Pallas TPU kernels)."""
