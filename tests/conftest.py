"""Test configuration: run on CPU with a virtual 8-device mesh so sharding
tests work without TPU hardware (SURVEY.md §4).

The session image force-registers an 'axon' TPU backend from
sitecustomize.py at interpreter start (overriding JAX_PLATFORMS via
jax.config), so we must override back through jax.config before any
backend is initialized.
"""

import os
import sys

flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_ROOT = '/root/reference'


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, 'renderformer'))


def import_reference():
    """Import the PyTorch reference package with missing optional deps
    stubbed (roma is only used inside trans_to_cam_coord, which our tests
    never call on the torch side)."""
    import types
    if REFERENCE_ROOT not in sys.path:
        # AFTER the repo root: both roots have top-level batch_infer.py /
        # infer.py / train.py, and `import batch_infer` from the CLI tests
        # must resolve to the repo's (the reference's pulls in deps this
        # image lacks). The reference's own packages (renderformer,
        # scene_processor) don't collide, so appending is safe.
        sys.path.append(REFERENCE_ROOT)
    sys.modules.setdefault('roma', types.ModuleType('roma'))
    os.environ.setdefault('ATTN_IMPL', 'sdpa')
    import renderformer  # noqa: F401
    return renderformer
