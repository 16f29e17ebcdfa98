"""Multi-host initialization.

The reference is strictly single-process (OpenMP shared memory,
SURVEY §2.3). Scaling beyond one host here is standard JAX SPMD:

    from bhraytracer_tpu.parallel.multihost import init_multihost
    init_multihost()                      # jax.distributed under TPU env vars
    mesh = make_mesh()                    # now spans all hosts' devices
    img = render_image_distributed(...)   # lanes sharded, scene replicated

Each host computes its devices' lane shards; `render_image_distributed`
assembles host-locally (addressable shards) — the psum'd gradients of
`train_step_sharded` ride ICI within a slice and DCN across slices, exactly
as XLA lays them out for a 1-D dp mesh.
"""

from __future__ import annotations

import os
from typing import Optional


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running under a multi-host launcher.

    No-ops (returns False) in single-process runs so the same entry point
    works everywhere. On TPU pods the arguments are auto-detected from the
    environment; they can be passed explicitly for CPU/GPU clusters.
    """
    import jax

    multi = (
        coordinator_address is not None
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("TPU_WORKER_HOSTNAMES")
    )
    if not multi:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True
