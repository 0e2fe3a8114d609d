"""Multi-host initialization (TPU pod slices / DCN).

Replaces the reference's torchrun + NCCL process-group setup
(/root/reference/train.py:26-69): on TPU pods, ``jax.distributed``
discovers coordinator/rank from the runtime environment; on CPU/GPU
clusters the same env-var contract as the reference
(MASTER_ADDR/MASTER_PORT/RANK/WORLD_SIZE) is honored.  Single-process
runs skip initialization entirely — the graceful fallback the reference
implements at train.py:32-34.
"""

from __future__ import annotations

import os
from typing import Optional


def setup_distributed(coordinator_address: Optional[str] = None,
                      num_processes: Optional[int] = None,
                      process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if a multi-process env is detected.

    Returns True when distributed mode is active.
    """
    import jax

    if num_processes is None and 'WORLD_SIZE' in os.environ:
        num_processes = int(os.environ['WORLD_SIZE'])
        process_id = int(os.environ.get('RANK', 0))
        addr = os.environ.get('MASTER_ADDR', 'localhost')
        port = os.environ.get('MASTER_PORT', '12355')
        coordinator_address = coordinator_address or f'{addr}:{port}'

    if num_processes is None or num_processes <= 1:
        # TPU pods: jax.distributed.initialize() with no args reads the
        # TPU runtime env; only call it when that env is present.
        if os.environ.get('TPU_WORKER_HOSTNAMES') and os.environ.get(
                'TPU_WORKER_ID') is not None:
            try:
                jax.distributed.initialize()
                return jax.process_count() > 1
            except Exception as e:
                print(f'jax.distributed.initialize failed: {e}; '
                      f'continuing single-process')
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def teardown_distributed() -> None:
    import jax
    try:
        jax.distributed.shutdown()
    except Exception:
        pass


def process_info() -> dict:
    import jax
    return {
        'process_index': jax.process_index(),
        'process_count': jax.process_count(),
        'local_devices': len(jax.local_devices()),
        'global_devices': len(jax.devices()),
    }
