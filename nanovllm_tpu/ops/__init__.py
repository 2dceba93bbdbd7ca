"""Device-side ops. Pure-jnp reference implementations live beside their
Pallas kernels; every kernel has a jnp twin used for CPU tests and as the
numerical oracle in kernel-equivalence tests."""
