"""Device-side compute primitives (JAX/XLA + Pallas kernels)."""
