"""Multi-host runtime bring-up (SURVEY.md section 3.5).

DCN bootstrap (`jax.distributed.initialize`) + mesh construction + dtype
policy. The reference is single-process; this is new surface for the
multi-host configs (BASELINE.json:11). ICI carries all compute collectives
(panel broadcasts, chain psums); DCN is only coordination + data feed.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax


@dataclasses.dataclass
class RuntimeInfo:
    process_index: int
    process_count: int
    local_devices: int
    global_devices: int
    backend: str


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None):
    """Bring up jax.distributed when running multi-host; no-op single host.

    Args may come from env (JAX discovers them on TPU pods automatically);
    explicit values support the CPU multi-process test harness
    (tests/multihost/run_multihost.py).
    """
    explicit = coordinator_address is not None
    multi_env = any(v in os.environ for v in
                    ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS"))
    if explicit or multi_env:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return RuntimeInfo(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        local_devices=jax.local_device_count(),
        global_devices=jax.device_count(),
        backend=jax.default_backend(),
    )
