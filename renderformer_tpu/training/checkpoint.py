"""Orbax checkpointing: save/restore TrainState + config + loss history.

TPU-native replacement for the reference torch.save checkpoint dict
(/root/reference/train.py:586-624): epoch, model params, optimizer state,
step, loss history and the model config all round-trip; best-val +
interval saving policy lives in the trainer.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from renderformer_tpu.config import RenderFormerConfig
from renderformer_tpu.training.state import TrainState


def save_checkpoint(ckpt_dir: str, tag: str, state: TrainState,
                    model_config: RenderFormerConfig,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Save under ``ckpt_dir/tag`` (overwrites).

    Multi-host: orbax coordinates across processes, so EVERY process must
    call this (unlike the reference's rank-0-only torch.save,
    train.py:588-589); the destructive/host-side steps (rmtree, meta
    JSON) stay rank-0-only here.
    """
    path = os.path.abspath(os.path.join(ckpt_dir, tag))
    is_main = jax.process_index() == 0
    multi = jax.process_count() > 1
    ckptr = ocp.StandardCheckpointer()
    if is_main and os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    if multi:
        # rmtree must complete everywhere-visible before the save starts
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(f'rftpu_ckpt_pre_{tag}')
    payload = {'params': state.params, 'opt_state': state.opt_state,
               'step': state.step}
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    if is_main:
        meta = {'model_config': model_config.to_dict(), 'extra': extra or {}}
        with open(os.path.join(path, 'renderformer_meta.json'), 'w') as f:
            json.dump(meta, f, indent=2, default=float)
    return path


def load_checkpoint(path: str, template: TrainState
                    ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the shape/dtype structure of ``template``."""
    ckptr = ocp.StandardCheckpointer()
    payload = {'params': template.params, 'opt_state': template.opt_state,
               'step': template.step}
    restored = ckptr.restore(os.path.abspath(path), payload)
    state = TrainState(params=restored['params'],
                       opt_state=restored['opt_state'],
                       step=restored['step'])
    meta_path = os.path.join(path, 'renderformer_meta.json')
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def export_params(path: str, params, model_config: RenderFormerConfig) -> None:
    """Export inference weights as an HF-style local checkpoint dir
    (config.json + model.safetensors) loadable by
    RenderingPipeline.from_pretrained."""
    from safetensors.numpy import save_file
    os.makedirs(path, exist_ok=True)
    model_config.save_json(os.path.join(path, 'config.json'))
    # marker distinguishing our JAX layout from reference torch checkpoints
    with open(os.path.join(path, 'jax_format.json'), 'w') as f:
        json.dump({'format': 'renderformer_tpu', 'version': 1}, f)

    flat = {}

    def walk(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, f'{prefix}.{k}' if prefix else k)
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                walk(v, f'{prefix}.{i}')
        else:
            flat[prefix] = np.asarray(node)

    walk(params, '')
    save_file(flat, os.path.join(path, 'model.safetensors'))


def import_params(path: str):
    """Load a dir written by export_params back into a nested pytree."""
    from safetensors.numpy import load_file
    import jax.numpy as jnp
    flat = load_file(os.path.join(path, 'model.safetensors'))

    tree: Dict[str, Any] = {}
    for key, val in flat.items():
        parts = key.split('.')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            v = listify(v)
            if isinstance(v, dict) and v and all(kk.isdigit() for kk in v):
                n = max(int(kk) for kk in v) + 1
                v = [v.get(str(i), {}) for i in range(n)]
            out[k] = v
        return out

    cfg = RenderFormerConfig.from_json(os.path.join(path, 'config.json'))
    return cfg, listify(tree)
