"""Multi-host (DCN) bootstrap.

The reference's multi-process story is colbert-ai's per-GPU Launcher +
mp.Manager queues (colbert_ir.py:175-181).  On TPU pods the equivalent is
``jax.distributed.initialize`` — after it, ``jax.devices()`` spans every
host and the same ``make_mesh`` / pjit code paths scale across DCN with no
further changes (XLA routes intra-slice collectives over ICI, cross-slice
over DCN).

Not exercisable in a single-host build; kept as the documented entry point
for pod deployments.
"""

from __future__ import annotations

import jax

from fusion_tpu.parallel.sharding import make_mesh


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the JAX distributed system (idempotent).

    With no arguments the TPU pod environment variables drive discovery
    (the standard Cloud TPU path).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:  # already initialized
        msg = str(e).lower()
        # jax <=0.4: "already initialized"; jax >=0.5: "should only be
        # called once"
        if "already" not in msg and "once" not in msg:
            raise


def pod_mesh(model: int = 1, index: int = 1):
    """A (data, model, index) mesh over every device in the pod.

    Call after ``initialize_multihost``; data absorbs the remaining devices
    so gradient psums ride ICI within a slice and DCN across slices.
    """
    return make_mesh(data=None, model=model, index=index, devices=jax.devices())


def is_primary_host() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
