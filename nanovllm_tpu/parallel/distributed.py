"""Multi-host (multi-process) initialization and the cross-host serving
design.

The reference has NO distributed communication layer at all — every
collective call-site is a TODO stub and it never spawns processes
(SURVEY §2.12). Here multi-host is native to the design:

- `initialize()` wraps `jax.distributed.initialize`: after it, every host
  process sees the GLOBAL device list, `build_mesh` lays the (data, model)
  axes over all chips, and the same jitted step compiles to one SPMD
  program whose collectives ride ICI within a slice and DCN across hosts.
- **Replicated-deterministic control plane** (docs/multihost.md): every
  host runs an identical scheduler + block manager driven by the same
  request stream (broadcast via `broadcast_object`). Scheduling is a pure
  function of that stream, so block tables and batch metadata are
  bit-identical on every host with no per-step coordination; only the
  request intake is synchronized.
"""

from __future__ import annotations

import logging
import pickle
from typing import Any, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Bring up the multi-host runtime. On TPU pods with standard metadata
    (GKE/GCE) all arguments auto-detect; pass them explicitly elsewhere.

    Call once per host process, before any jax computation."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "distributed: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )


def is_multihost() -> bool:
    return jax.process_count() > 1


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a small picklable object (e.g. a batch of incoming
    requests) from `root` to all host processes via a device all-reduce —
    the intake synchronization for the replicated-deterministic scheduler.
    """
    from jax.experimental import multihost_utils

    if not is_multihost():
        return obj
    payload = pickle.dumps(obj) if jax.process_index() == root else b""
    # Fixed-size exchange: length first, then padded bytes.
    n = np.zeros((1,), np.int32)
    if jax.process_index() == root:
        n[0] = len(payload)
    n = multihost_utils.broadcast_one_to_all(n, is_source=jax.process_index() == root)
    buf = np.zeros((int(n[0]),), np.uint8)
    if jax.process_index() == root:
        buf[:] = np.frombuffer(payload, np.uint8)
    buf = multihost_utils.broadcast_one_to_all(
        buf, is_source=jax.process_index() == root
    )
    return pickle.loads(buf.tobytes())
