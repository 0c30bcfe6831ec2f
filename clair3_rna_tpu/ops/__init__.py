"""Device compute kernels (Pallas TPU + jax fallbacks)."""
