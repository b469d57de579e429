"""Test configuration: run on CPU with 8 virtual devices (so sharding /
halo-exchange logic is testable without a TPU slice; SURVEY.md §4) and
float64 enabled (the accuracy bar is 1e-8 relative residual).

NOTE: this environment pre-imports jax via sitecustomize with
JAX_PLATFORMS=axon (a tunneled TPU).  Env vars are therefore captured before
conftest runs — we must switch platforms through jax.config, not os.environ.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
