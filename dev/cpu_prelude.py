# Shared prelude for ad-hoc dev scripts: pin CPU + x64 before any jax use.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
