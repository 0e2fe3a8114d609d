"""End-to-end A/B of the pair-window swin kernel at 483M on real TPU:
bench.py's swin-large bf16 config with RFTPU_SWIN_KERNEL on vs off.

Run each arm in its OWN process (the toggle is trace-time; bench_config
builds a fresh jit per process):
    python tools/swin_e2e_ab.py on
    python tools/swin_e2e_ab.py off
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

arm = sys.argv[1] if len(sys.argv) > 1 else 'on'
os.environ['RFTPU_SWIN_KERNEL'] = '1' if arm == 'on' else '0'

import jax  # noqa: E402
jax.config.update('jax_compilation_cache_dir', '/root/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)

from bench import bench_config  # noqa: E402

rays = bench_config('v1.1-swin-large', 'bf16')
print(f'swin-large bf16 512^2, RFTPU_SWIN_KERNEL={arm}: '
      f'{rays/1e6:.2f} M rays/s '
      f'({8 * 512 * 512 / rays * 1e3:.1f} ms/step)', flush=True)
