"""Device (JAX/XLA/Pallas) kernels for the hot compute path."""
