"""Global configuration for kpop-tpu.

Precision policy
----------------
The reference computes everything in float64 on CPU (OCaml floats).  TPUs are
fastest in float32/bfloat16; float64 is emulated and slow.  We therefore:

- run all large TPU kernels (counting, projection, distances, CA Gram matrix)
  in float32 by default (``compute_dtype``);
- do small, precision-critical reductions (CA eigendecomposition of the
  [n_samples, n_samples] Gram matrix, summary statistics) in float64 on host
  via numpy, which is exact enough for parity with the reference;
- allow opting into full float64 JAX computation (for CPU parity testing) by
  setting the environment variable ``KPOP_X64=1`` before importing kpop_tpu.

Environment variables
---------------------
KPOP_X64=1        enable jax_enable_x64 and float64 compute_dtype.
KPOP_PLATFORM=cpu force a JAX platform (tests use cpu + virtual devices).
"""

from __future__ import annotations

import os

import jax

if os.environ.get("KPOP_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["KPOP_PLATFORM"])

X64 = os.environ.get("KPOP_X64", "0") not in ("", "0", "false", "False")
if X64:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402  (after x64 flag)

#: dtype used for large on-device arrays
compute_dtype = jnp.float64 if X64 else jnp.float32
#: dtype used for count storage
count_dtype = jnp.int32

#: maximum k for which the dense 4^k TPU counting path is used (4^13 = 67M
#: int32 = 268 MB, fits HBM; beyond that the host sparse path takes over)
DENSE_K_MAX = int(os.environ.get("KPOP_DENSE_K_MAX", "13"))


def default_device_count() -> int:
    return jax.device_count()
