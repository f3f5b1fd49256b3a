"""Device decode kernels (Pallas / jnp). Populated by the M1+ milestones."""
