"""Training loop: epochs, validation, metrics, checkpoints.

TPU-native RenderFormerTrainer (parity with /root/reference/train.py:
276-641): jit-compiled train step over a GSPMD mesh replaces DDP; the
NaN-skip lives inside the step (state.py); TensorBoard metrics, best-val
+ interval checkpointing, and the loss plot artifact are preserved.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from renderformer_tpu.models.renderformer import RenderFormer
from renderformer_tpu.parallel.sharding import (
    make_mesh, replicated, use_sharding)
from renderformer_tpu.training.checkpoint import load_checkpoint, save_checkpoint
from renderformer_tpu.training.dataset import RenderFormerDataset
from renderformer_tpu.training.state import (
    TrainConfig, TrainState, make_optimizer, make_train_step)


@dataclass
class TrainerConfig:
    train: TrainConfig = field(default_factory=TrainConfig)
    batch_size: int = 1
    train_val_split: float = 0.8
    checkpoint_dir: str = 'checkpoints'
    log_dir: str = 'runs/renderformer_tpu'
    save_interval: int = 5
    mesh_shape: Optional[tuple] = None   # None -> (n_devices, 1)
    attn_impl: str = 'auto'
    resume_from: Optional[str] = None
    seed: int = 42
    log_every: int = 10   # host metric fetch + TB write cadence (steps)


class RenderFormerTrainer:
    def __init__(self, model: RenderFormer, params,
                 dataset: RenderFormerDataset, cfg: TrainerConfig):
        self.model = model
        self.dataset = dataset
        self.cfg = cfg
        # multi-host: coordinated init happens in train.py
        # (setup_distributed); here we gate side effects on rank 0 like
        # the reference (train.py:588-589) and load data per-process
        self.rank = jax.process_index()
        self.world = jax.process_count()
        self.is_main = self.rank == 0
        tc = cfg.train
        n_batches = max(1, (len(dataset) // max(cfg.batch_size, 1)))
        tc = TrainConfig(**{**tc.__dict__,
                            'steps_per_epoch': n_batches,
                            'resolution': dataset.max_resolution})
        self.tc = tc
        tc.apply_debug_flags()

        self.tx = make_optimizer(tc)
        self.state = TrainState.create(params, self.tx)
        if tc.bf16_shadow_params and tc.precision != 'float32':
            # build the compute-dtype shadow up front so every step —
            # including the first — jit-traces one TrainState structure
            from renderformer_tpu.training.state import make_shadow_tree
            import dataclasses as _dc
            self.state = _dc.replace(
                self.state, shadow=make_shadow_tree(params, tc))

        impl = cfg.attn_impl
        if impl == 'auto':
            impl = 'flash' if jax.devices()[0].platform == 'tpu' else 'xla'
        train_step, eval_step = make_train_step(model, self.tx, tc, impl=impl)

        mesh_shape = cfg.mesh_shape
        if mesh_shape is None:
            # data axis limited by batch divisibility; leftover devices do
            # sequence parallelism over ray tokens (small-batch fine-tuning,
            # the reference's bs=1 default, still uses every chip)
            import math
            n_dev = len(jax.devices())
            data = math.gcd(cfg.batch_size, n_dev)
            mesh_shape = (data, n_dev // data)
        self.mesh = make_mesh(mesh_shape)
        self._repl = replicated(self.mesh)
        self._data_sh = NamedSharding(self.mesh, P('data'))
        with use_sharding(self.mesh):
            self._train_step = jax.jit(
                train_step,
                in_shardings=(self._repl, self._data_sh),
                out_shardings=(self._repl, self._repl))
            self._eval_step = jax.jit(
                eval_step,
                in_shardings=(self._repl, self._data_sh),
                out_shardings=self._repl)

        self.state = jax.device_put(self.state, self._repl)
        self.train_losses: List[float] = []
        self.val_losses: List[float] = []
        self.start_epoch = 0
        self._writer = None
        # checkpoint writes run on a background thread so a save never
        # blocks step dispatch (preemption safety without a stall);
        # single worker -> saves are ordered, drain() at fit() end
        from renderformer_tpu.utils.prefetch import AsyncWriter
        self._ckpt_writer = AsyncWriter(max_workers=1, max_pending=2)

        if cfg.resume_from:
            self.state, meta = load_checkpoint(cfg.resume_from, self.state)
            if tc.bf16_shadow_params and tc.precision != 'float32':
                # the shadow is not checkpointed; rebuild from the
                # restored masters
                from renderformer_tpu.training.state import make_shadow_tree
                import dataclasses as _dc
                self.state = _dc.replace(
                    self.state,
                    shadow=make_shadow_tree(self.state.params, tc))
            self.state = jax.device_put(self.state, self._repl)
            extra = meta.get('extra', {})
            self.start_epoch = int(extra.get('epoch', -1)) + 1
            self.train_losses = list(extra.get('train_losses', []))
            self.val_losses = list(extra.get('val_losses', []))
            print(f'resumed from {cfg.resume_from} at epoch {self.start_epoch}')

    # ------------------------------------------------------------------
    @property
    def writer(self):
        if self._writer is None:
            class _Null:
                def add_scalar(self, *a, **k):
                    pass

                def close(self):
                    pass
            if not self.is_main:
                # rank-0-only TensorBoard, like the reference
                # (train.py:325-328)
                self._writer = _Null()
                return self._writer
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._writer = SummaryWriter(self.cfg.log_dir)
            except Exception:
                self._writer = _Null()
        return self._writer

    def _print(self, *args, **kwargs):
        if self.is_main:
            print(*args, **kwargs)

    def _put_batch(self, batch: Dict[str, np.ndarray]):
        if self.world > 1:
            # assemble the global batch from this process's local rows
            # (SURVEY.md §7.1: jax.make_array_from_process_local_data)
            return {
                k: jax.make_array_from_process_local_data(
                    self._data_sh, np.asarray(v))
                for k, v in batch.items()
            }
        return jax.device_put(
            {k: jnp.asarray(v) for k, v in batch.items()}, self._data_sh)

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int, indices) -> float:
        # metrics stay on device; the host syncs only every `log_every`
        # steps and once at epoch end, so step dispatch is never blocked
        # by a scalar fetch (the round-1 per-step float() stall)
        pending: List[tuple] = []
        t0 = time.time()
        every = max(1, self.cfg.log_every)

        # H5 gzip decode + padding + host->device upload run on a
        # background thread, two batches deep, so the device never waits
        # on the loader (device_put is async; the upload of batch i+1
        # overlaps step i).  Measured on the round-4 TPU fine-tune run:
        # the loop was data-bound at 3-8 s/step without this.
        from renderformer_tpu.utils.prefetch import prefetch

        def loaded():
            for b in self.dataset.batches(
                    indices, self.cfg.batch_size, shuffle=True,
                    seed=self.cfg.seed + epoch,
                    rank=self.rank, world=self.world):
                yield self._put_batch(b)

        for i, batch in enumerate(prefetch(loaded(), depth=2)):
            self.state, metrics = self._train_step(self.state, batch)
            pending.append((int(i), metrics))
            if i % every == 0:
                loss = float(metrics['loss'])
                gnorm = float(metrics['grad_norm'])
                self._print(f'  epoch {epoch} batch {i}: loss={loss:.6f} '
                            f'gnorm={gnorm:.4f} ({time.time() - t0:.1f}s)')

        total, n = 0.0, 0
        step0 = int(self.state.step) - len(pending)
        for i, metrics in pending:
            loss = float(metrics['loss'])
            if np.isfinite(loss):
                total += loss
                n += 1
            if i % every == 0:
                self.writer.add_scalar('Loss/Train_Batch', loss, step0 + i + 1)
                self.writer.add_scalar(
                    'Grad_Norm/Train', float(metrics['grad_norm']),
                    step0 + i + 1)
        avg = total / n if n else float('inf')
        self.train_losses.append(avg)
        self.writer.add_scalar('Loss/Train_Epoch', avg, epoch)
        return avg

    def validate(self, epoch: int, indices) -> float:
        # pad_last: a val set smaller than the batch size is padded (and
        # mask-weighted in eval_step) instead of silently dropped — the
        # reference validates every sample (train.py:508-584)
        from renderformer_tpu.utils.prefetch import prefetch
        pending = []
        for batch in prefetch(
                (self._put_batch(b) for b in self.dataset.batches(
                    indices, self.cfg.batch_size, shuffle=False,
                    pad_last=True, rank=self.rank, world=self.world)),
                depth=2):
            pending.append(self._eval_step(self.state.params, batch))
        total, n = 0.0, 0.0
        for m in pending:
            s, c = float(m['loss_sum']), float(m['n'])
            if np.isfinite(s):
                total += s
                n += c
        avg = total / n if n else float('inf')
        self.val_losses.append(avg)
        self.writer.add_scalar('Loss/Val_Epoch', avg, epoch)
        return avg

    # ------------------------------------------------------------------
    def fit(self) -> Dict[str, Any]:
        # preemption safety (SURVEY.md §5 failure recovery): TPU
        # maintenance events deliver SIGTERM — snapshot a resumable
        # checkpoint before dying.  The reference has no equivalent
        # (its OOM/exception retry is per-batch only, train.py:471-482).
        import signal

        def _on_sigterm(signum, frame):
            self._print('SIGTERM: saving preemption checkpoint...')
            try:
                save_checkpoint(
                    self.cfg.checkpoint_dir, 'preempted', self.state,
                    self.model.config,
                    {'epoch': len(self.train_losses) - 1,
                     'train_losses': list(self.train_losses),
                     'val_losses': list(self.val_losses)})
            finally:
                signal.signal(signal.SIGTERM, signal.SIG_DFL)
                raise SystemExit(143)

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:
            pass  # not the main thread (e.g. tests); skip the hook

        try:
            return self._fit_inner()
        finally:
            if prev_handler is not None:
                try:
                    signal.signal(signal.SIGTERM, prev_handler)
                except ValueError:
                    pass

    def _fit_inner(self) -> Dict[str, Any]:
        train_idx, val_idx = self.dataset.split(
            self.cfg.train_val_split, self.cfg.seed)
        self._print(f'training on {len(train_idx)} scenes, '
                    f'validating on {len(val_idx)}'
                    + (f' across {self.world} processes'
                       if self.world > 1 else ''))
        best_val = min(self.val_losses, default=float('inf'))

        for epoch in range(self.start_epoch, self.tc.num_epochs):
            train_loss = self.train_epoch(epoch, train_idx)
            val_loss = (self.validate(epoch, val_idx)
                        if val_idx else float('inf'))
            self._print(
                f'epoch {epoch}: train={train_loss:.6f} val={val_loss:.6f}')

            # rank-0-only checkpointing, like the reference
            # (train.py:588-589); replicated state is host-addressable
            extra = {'epoch': epoch, 'train_losses': list(self.train_losses),
                     'val_losses': list(self.val_losses)}
            if val_loss < best_val:
                best_val = val_loss
                self._save_async('best', self.state, extra)
            if (epoch + 1) % self.cfg.save_interval == 0:
                self._save_async(f'epoch_{epoch}', self.state, extra)

        self._save_async('final', self.state,
                         {'epoch': self.tc.num_epochs - 1,
                          'train_losses': list(self.train_losses),
                          'val_losses': list(self.val_losses)})
        self._ckpt_writer.close()
        if self.is_main:
            self.plot_losses()
        self.writer.close()
        return {'train_losses': self.train_losses,
                'val_losses': self.val_losses}

    def _save_async(self, tag: str, state, extra):
        """Background-thread checkpoint save (jax arrays are immutable, so
        passing the live state is snapshot-safe).  Multi-host saves run
        synchronously on every rank instead — orbax's cross-process
        barriers must not interleave with compute collectives from the
        main thread."""
        if self.world > 1:
            save_checkpoint(self.cfg.checkpoint_dir, tag, state,
                            self.model.config, extra)
            return
        self._ckpt_writer.submit(
            save_checkpoint, self.cfg.checkpoint_dir, tag, state,
            self.model.config, extra)

    def plot_losses(self):
        """training_losses.png artifact (train.py:626-641), written next
        to the TensorBoard logs rather than the process cwd."""
        try:
            import os
            import matplotlib
            matplotlib.use('Agg')
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots()
            ax.plot(self.train_losses, label='train')
            if self.val_losses:
                ax.plot(self.val_losses, label='val')
            ax.set_xlabel('epoch')
            ax.set_ylabel('MSE loss')
            ax.legend()
            os.makedirs(self.cfg.log_dir, exist_ok=True)
            fig.savefig(os.path.join(self.cfg.log_dir,
                                     'training_losses.png'), dpi=100)
            plt.close(fig)
        except Exception as e:
            print(f'loss plot skipped: {e}')
