"""Global configuration for kpop-tpu.

Precision policy
----------------
The reference computes everything in float64 on CPU (OCaml floats).  TPUs are
fastest in float32/bfloat16; float64 is emulated and slow.  We therefore:

- run all large TPU kernels (counting, projection, distances, CA Gram matrix)
  in float32 by default (``compute_dtype()``);
- do small, precision-critical reductions (CA eigendecomposition of the
  [n_samples, n_samples] Gram matrix, summary statistics) in float64 on host
  via numpy, which is exact enough for parity with the reference;
- allow opting into full float64 JAX computation (for CPU parity testing) by
  setting the environment variable ``KPOP_X64=1`` before importing JAX.

JAX is imported lazily (via :func:`jax_setup`) so that the pure-numpy CLI
paths do not pay JAX/XLA startup cost.

Environment variables
---------------------
KPOP_X64=1        enable jax_enable_x64 and float64 compute dtype.
KPOP_PLATFORM=cpu force a JAX platform (tests use cpu + virtual devices).
KPOP_DENSE_K_MAX  max k for the dense 4^k counting path (default 13).
"""

from __future__ import annotations

import os

X64 = os.environ.get("KPOP_X64", "0") not in ("", "0", "false", "False")

#: maximum k for which the dense 4^k counting path is used (4^13 = 67M
#: int32 = 268 MB, fits HBM; beyond that the host sparse path takes over)
DENSE_K_MAX = int(os.environ.get("KPOP_DENSE_K_MAX", "13"))

_configured = False


def jax_setup():
    """Import and configure JAX on first use; returns the jax module."""
    global _configured
    import jax

    if not _configured:
        if os.environ.get("KPOP_PLATFORM"):
            jax.config.update("jax_platforms", os.environ["KPOP_PLATFORM"])
        if X64:
            jax.config.update("jax_enable_x64", True)
        # persistent compilation cache: TPU compiles (especially through
        # remote tunnels) are expensive and at times erratic; cache them.
        cache_dir = os.environ.get(
            "KPOP_JAX_CACHE", os.path.expanduser("~/.cache/kpop_jax_cache")
        )
        if cache_dir:
            try:
                os.makedirs(cache_dir, exist_ok=True)
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0
                )
            except Exception:
                pass
        _configured = True
    return jax


def compute_dtype():
    import jax.numpy as jnp

    return jnp.float64 if X64 else jnp.float32
