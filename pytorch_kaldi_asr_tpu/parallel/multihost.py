"""Multi-host (multi-slice) initialization.

The reference's cross-machine story is file-based SGE scheduling (SURVEY.md
§2d/§5.8); TPU-natively, each host runs the SAME program and joins one JAX
runtime — collectives then span all chips over ICI/DCN with no user-visible
backend.  This module wraps ``jax.distributed.initialize`` with the usual
environment conventions so recipes stay launcher-agnostic:

- on Cloud TPU pods, ``jax.distributed.initialize()`` self-discovers from
  the TPU metadata — no arguments needed;
- elsewhere, set PKA_COORDINATOR (host:port), PKA_NUM_PROCESSES and
  PKA_PROCESS_ID (e.g. exported by a cluster scheduler), or pass them
  explicitly.

Typical multi-host recipe pattern::

    from pytorch_kaldi_asr_tpu.parallel import multihost, mesh
    multihost.initialize()                 # no-op for single host
    m = mesh.make_mesh(model=2)            # mesh spans ALL hosts' devices
    # ... identical train code; data loading uses process_index() shards
"""

from __future__ import annotations

import os

from pytorch_kaldi_asr_tpu.utils.logging import info


def initialize(coordinator=None, num_processes=None, process_id=None):
    """Join the multi-host runtime; silently a no-op for 1-process runs.
    Returns (process_index, process_count)."""
    import jax

    coordinator = coordinator or os.environ.get("PKA_COORDINATOR")
    num_processes = num_processes or _env_int("PKA_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _env_int(
        "PKA_PROCESS_ID"
    )

    if coordinator or (num_processes and num_processes > 1):
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
        info(
            "joined distributed runtime: process %d / %d, %d local / %d "
            "global devices",
            jax.process_index(), jax.process_count(),
            jax.local_device_count(), jax.device_count(),
        )
    return jax.process_index(), jax.process_count()


def _env_int(name):
    value = os.environ.get(name)
    return int(value) if value else None


def shard_for_process(items, process_index=None, process_count=None):
    """Deterministic per-host slice of a work list, truncated to a common
    length: every host MUST execute the same number of jitted steps (a host
    with one extra batch would enter a collective the others never reach and
    deadlock the slice), so the ragged remainder is dropped."""
    import jax

    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    per_host = len(items) // process_count
    dropped = len(items) - per_host * process_count
    if dropped:
        info(
            "shard_for_process: dropping %d ragged items so all %d hosts "
            "run equal step counts", dropped, process_count,
        )
    start = process_index * per_host
    return items[start : start + per_host]
