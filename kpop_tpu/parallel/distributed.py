"""Multi-host (multi-process) initialization.

The reference has no distributed backend — multi-node runs are manual file
sharding (SURVEY.md §2.5/P3).  kpop-tpu runs as one SPMD job:
``initialize()`` wires up ``jax.distributed`` (TPU pods auto-discover
coordinates; CPU/GPU test rigs pass them explicitly), after which the same
mesh/sharding code paths work unchanged from 1 chip to a full pod — in-slice
collectives ride ICI, host-sharded input (parallel/input.py) and sharded
checkpoints (parallel/checkpoint.py) ride DCN.
"""

from __future__ import annotations

import os

from ..config import jax_setup


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize jax.distributed if running multi-process.

    No-ops when single-process (the common dev case) unless explicit
    coordinates are given.  On TPU pods all arguments are auto-detected.
    """
    jax = jax_setup()
    env_says_multiprocess = any(
        os.environ.get(v)
        for v in (
            "JAX_COORDINATOR_ADDRESS",
            "COORDINATOR_ADDRESS",
            "TPU_WORKER_HOSTNAMES",
            "MEGASCALE_COORDINATOR_ADDRESS",
        )
    )
    if (
        coordinator_address is None
        and num_processes is None
        and not env_says_multiprocess
    ):
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    jax = jax_setup()
    return jax.process_index() == 0
