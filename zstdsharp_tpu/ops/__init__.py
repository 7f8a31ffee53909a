"""Device (TPU) kernels.

The codec manipulates 64-bit windows and bit containers, so the ops package
requires x64 mode; it is enabled at import, before any tracing.
"""

import jax

jax.config.update("jax_enable_x64", True)
