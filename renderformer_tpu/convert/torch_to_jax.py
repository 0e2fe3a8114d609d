"""Convert reference PyTorch checkpoints to renderformer_tpu param pytrees.

Works on a flat ``state_dict``-style mapping of numpy arrays (torch is only
imported lazily, so the module stays usable without it).  The param-tree key
structure intentionally mirrors the reference module tree
(/root/reference/renderformer/models/renderformer.py), so conversion is a
mechanical walk plus layout fixes, classified by tensor rank:
  * rank-2 Linear  [out, in]         -> kernel [in, out]
  * rank-1 weight                    -> norm scale; rank-1 bias -> bias
  * rank-4 Conv2d  [O, I, kh, kw]    -> [kh, kw, I, O]  (OIHW -> HWIO)
  * rank-4 ConvTranspose2d [I, O, kh, kw] -> [kh, kw, I, O]
    (only ``resize_layers.0`` / ``resize_layers.1`` in the whole model)
  * rank-3 token parameters          -> kept as-is
  * rope ``freqs`` buffers           -> ``rope_freqs``
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np

from renderformer_tpu.config import RenderFormerConfig


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convert_key(tree: dict, key: str, value: np.ndarray):
    parts = key.split('.')
    name = parts[-1]

    # rope frequency buffers: <prefix>.rope_emb.freqs -> <prefix>.rope_freqs
    if parts[-2:] == ['rope_emb', 'freqs']:
        _set(tree, tuple(parts[:-2]) + ('rope_freqs',), jnp.asarray(value))
        return
    if name == 'dummy':  # device buffer in TriangleRotaryEmbedding
        return

    # DPT output_conv2 is an nn.Sequential: index 0 -> conv1, 2 -> conv2
    if len(parts) >= 3 and parts[-3] == 'output_conv2':
        parts = parts[:-3] + ['output_conv2', {'0': 'conv1', '2': 'conv2'}[parts[-2]], name]

    path = tuple(parts[:-1])

    if value.ndim == 4:
        module = '.'.join(parts[-3:-1])
        if module in ('resize_layers.0', 'resize_layers.1'):
            # ConvTranspose2d [I, O, kh, kw] -> [kh, kw, I, O]
            kernel = np.transpose(value, (2, 3, 0, 1))
        else:
            # Conv2d OIHW -> HWIO
            kernel = np.transpose(value, (2, 3, 1, 0))
        _set(tree, path + ('kernel',), jnp.asarray(kernel))
    elif value.ndim == 3:
        # learned tokens: tri_token, reg_tokens, ray_map_patch_token
        _set(tree, tuple(parts), jnp.asarray(value))
    elif value.ndim == 2:
        _set(tree, path + ('kernel',), jnp.asarray(value.T))
    elif value.ndim == 1:
        leaf = 'scale' if name == 'weight' else 'bias'
        _set(tree, path + (leaf,), jnp.asarray(value))
    else:
        raise ValueError(f'Unexpected tensor rank for {key}: {value.shape}')


def _listify_indexed(node):
    """Turn {'0': ..., '1': ...} child dicts (nn.ModuleList) into lists."""
    if not isinstance(node, dict):
        return node
    out = {}
    for k, v in node.items():
        v = _listify_indexed(v)
        if isinstance(v, dict) and v and all(kk.isdigit() for kk in v):
            # sparse indices happen (e.g. resize_layers.2 is nn.Identity)
            n = max(int(kk) for kk in v) + 1
            v = [v.get(str(i), {}) for i in range(n)]
        out[k] = v
    return out


def convert_state_dict(state_dict: Mapping[str, np.ndarray]) -> Dict:
    """Flat torch state_dict (numpy arrays) -> nested param pytree."""
    tree: Dict = {}
    for key, val in state_dict.items():
        _convert_key(tree, key, np.asarray(val))
    return _listify_indexed(tree)


def convert_torch_model(model) -> Dict:
    """Convert a live reference ``RenderFormer`` nn.Module."""
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    return convert_state_dict(sd)


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    from safetensors.numpy import load_file
    return load_file(path)


def load_pretrained(model_dir: str):
    """Load (config, params) from a local HF-format checkpoint directory
    containing ``config.json`` + ``model.safetensors``."""
    import os
    cfg = RenderFormerConfig.from_json(os.path.join(model_dir, 'config.json'))
    sd = load_safetensors(os.path.join(model_dir, 'model.safetensors'))
    return cfg, convert_state_dict(sd)
