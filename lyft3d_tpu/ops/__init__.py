"""Device-side ops (jax.numpy + Pallas kernels).

Every CUDA/numba native component of the reference (SURVEY.md §2.3 N1–N10)
has a TPU-native equivalent here. Each op ships a pure-jnp reference
implementation plus, for the hot ones, a Pallas TPU kernel verified against
it in tests.
"""
