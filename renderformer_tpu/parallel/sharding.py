"""GSPMD sharding: one mesh, logical-name constraint rules.

TPU-native replacement for the reference's NCCL DDP (train.py:26-63,
289-296): a single ``jax.sharding.Mesh`` with axes ``(data, seq)``.
Scenes/views shard over ``data`` (the DDP equivalent); ray/triangle token
sequences shard over ``seq`` (sequence parallelism over ICI — the TPU
answer to the reference's flash-attn varlen unpadding, SURVEY.md §2.8).

Models call :func:`constrain` with a logical name at key activation
sites; inside a :func:`use_sharding` context these become
``with_sharding_constraint`` annotations and XLA inserts the collectives.
Outside the context they are no-ops, so single-device paths stay clean.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE: contextvars.ContextVar = contextvars.ContextVar(
    'renderformer_tpu_sharding', default=None)

# Logical activation names -> PartitionSpec under the (data, seq) mesh.
# tokens:     [B, S, D]        stage-1 triangle tokens
# ray_tokens: [B*V, S_ray, D]  stage-2 ray tokens (sequence-parallel)
# image:      [B*V, H, W, C]   decoded image (spatial rows sharded)
DEFAULT_RULES: Dict[str, P] = {
    'tokens': P('data', None, None),
    'ray_tokens': P('data', 'seq', None),
    'image': P('data', 'seq', None, None),
    'batch': P('data'),
}


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ('data', 'seq'),
              devices=None) -> Mesh:
    """Build a device mesh. Default: all devices on ``data``."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices), 1)
    return Mesh(devices.reshape(shape), axis_names=tuple(axis_names))


@contextlib.contextmanager
def use_sharding(mesh: Mesh, rules: Optional[Dict[str, P]] = None,
                 sp_mode: str = 'gspmd'):
    """Activate sharding constraints for model code traced inside.

    sp_mode selects the sequence-parallel attention strategy:
      * 'gspmd' (default): constraints only; XLA all-gathers KV for the
        seq-sharded attention sites (the right call at ≤8k triangles,
        SURVEY.md §7.3);
      * 'ring': attention sites with key-padding masks run
        :mod:`renderformer_tpu.parallel.ring_attention` — KV shards stay
        put and rotate over ICI; peak memory O(Sk / ring size).
    """
    if sp_mode not in ('gspmd', 'ring'):
        raise ValueError(f'unknown sp_mode {sp_mode!r}')
    token = _ACTIVE.set(
        (mesh, dict(DEFAULT_RULES if rules is None else rules), sp_mode))
    try:
        yield
    finally:
        _ACTIVE.reset(token)


def active_mesh() -> Optional[Mesh]:
    ctx = _ACTIVE.get()
    return ctx[0] if ctx else None


def active_ring_mesh() -> Optional[Mesh]:
    """The active mesh if sp_mode == 'ring' was requested, else None."""
    ctx = _ACTIVE.get()
    if ctx is None or ctx[2] != 'ring':
        return None
    return ctx[0]


def constrain(x, name: str):
    """Apply the active sharding rule for logical name ``name`` (no-op if
    no context active or no rule defined)."""
    ctx = _ACTIVE.get()
    if ctx is None:
        return x
    mesh, rules = ctx[0], ctx[1]
    spec = rules.get(name)
    if spec is None:
        return x
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def input_sharding(mesh: Mesh, batch_axis: str = 'data') -> NamedSharding:
    """Sharding for host inputs: leading batch dim over ``batch_axis``."""
    return NamedSharding(mesh, P(batch_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
