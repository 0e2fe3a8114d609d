"""Train state and the jit-compiled distributed train step.

TPU-native replacement for the reference DDP trainer internals
(/root/reference/train.py:276-506): AdamW + cosine LR + grad clip
(train.py:308-322,440-444), MSE loss vs ground-truth images
(train.py:318,401), NaN-loss skip folded into the step as a no-op update
(train.py:404-407), and gradient all-reduce emitted by GSPMD from the
replicated-param sharding instead of DDP hooks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from renderformer_tpu.models.renderformer import RenderFormer
from renderformer_tpu.pipelines.rendering_pipeline import render_fn


@dataclasses.dataclass
class TrainConfig:
    learning_rate: float = 5e-6
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    num_epochs: int = 3
    steps_per_epoch: int = 1000
    warmup_steps: int = 0
    resolution: int = 256
    precision: str = 'bfloat16'
    view_precision: str = ''   # '' -> reference semantics (fp32 island
    #                               under half, bf16 under fp32)
    min_lr_scale: float = 0.0  # cosine floor (eta_min / lr)
    remat: bool = False  # gradient checkpointing (ref train.py:302-305)
    bf16_shadow_params: bool = False  # keep a compute-dtype param copy
    # updated in the optimizer epilogue instead of re-casting the fp32
    # masters inside every forward+backward (the reference's AMP
    # master-weight pattern, train.py:334,415-448)
    seed: int = 0        # dropout rng seed (folded with the step counter)
    skip_nonfinite: bool = True
    debug_nans: bool = False       # jax_debug_nans (SURVEY.md §5 sanitizers)
    deterministic: bool = False    # bitwise-reproducible XLA reductions

    def apply_debug_flags(self):
        import jax
        if self.debug_nans:
            jax.config.update('jax_debug_nans', True)
        if self.deterministic:
            import os
            flags = os.environ.get('XLA_FLAGS', '')
            if '--xla_tpu_enable_deterministic' not in flags:
                os.environ['XLA_FLAGS'] = (
                    flags + ' --xla_tpu_enable_deterministic_reductions'
                ).strip()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # compute-dtype shadow of params (bf16_shadow_params); None = off.
    # Excluded from checkpoints — rebuilt from the masters on resume.
    shadow: Any = None

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    """AdamW + cosine schedule + global-norm clip (train.py:308-322)."""
    total_steps = max(1, tc.num_epochs * tc.steps_per_epoch)
    schedule = optax.warmup_cosine_decay_schedule(
        init_value=0.0 if tc.warmup_steps else tc.learning_rate,
        peak_value=tc.learning_rate,
        warmup_steps=tc.warmup_steps,
        decay_steps=total_steps,
        end_value=tc.learning_rate * tc.min_lr_scale,
    )
    return optax.chain(
        optax.clip_by_global_norm(tc.max_grad_norm),
        optax.adamw(schedule, weight_decay=tc.weight_decay),
    )


def resolve_dtypes(tc: TrainConfig):
    """(stage-1 dtype, stage-2 dtype) from the precision config;
    '' view_precision keeps the reference semantics (fp32 island under
    half, bf16 under fp32 — rendering_pipeline.py:99)."""
    dtype = (jnp.bfloat16 if tc.precision in ('bfloat16', 'bf16')
             else jnp.float32)
    if tc.view_precision:
        view_dtype = (jnp.bfloat16
                      if tc.view_precision in ('bfloat16', 'bf16')
                      else jnp.float32)
    else:
        view_dtype = jnp.float32 if dtype == jnp.bfloat16 else jnp.bfloat16
    return dtype, view_dtype


def make_shadow_tree(params, tc: TrainConfig):
    """Compute-dtype shadow of the fp32 masters (bf16_shadow_params):
    the per-stage pre-cast tree the model's internal cast_params treats
    as a no-op.  Call once at trainer init so the first jit trace sees
    the same TrainState structure as every later step."""
    from renderformer_tpu.nn.core import cast_params
    dtype, view_dtype = resolve_dtypes(tc)
    vt = cast_params(params['view_transformer'], view_dtype)
    rest = cast_params(
        {k: v for k, v in params.items() if k != 'view_transformer'}, dtype)
    return {**rest, 'view_transformer': vt}


def make_train_step(model: RenderFormer, tx: optax.GradientTransformation,
                    tc: TrainConfig, impl: str = 'xla'):
    """Build the (un-jitted) train step: grads of MSE(render, gt).

    batch: dict of triangles [B,N,3,3], texture [B,N,13,ps,ps], mask [B,N],
    vn [B,N,3,3], c2w [B,V,4,4], fov [B,V,1], gt [B,V,H,W,3].
    """
    if tc.remat and not model.remat:
        model = dataclasses.replace(model, remat=True)
    dtype, view_dtype = resolve_dtypes(tc)

    # dropout is active only when the architecture asks for it; the rng is
    # derived from the step counter -> deterministic, resume-stable
    use_dropout = model.config.dropout > 0.0

    def batch_texture(batch):
        """Texture patches from the batch: either the full [B,N,13,ps,ps]
        tensor, or broadcast ON DEVICE from the compact [B,N,13] form the
        dataset cache ships (dataset.compact_texture) — the padded patch
        upload was 109 MB f16 per step at the 4096 bucket; the compact
        form is 0.1 MB and the broadcast is one fused device op."""
        if 'texture' in batch:
            return batch['texture']
        from renderformer_tpu.scene.to_h5 import texture_patch_mask
        flat = batch['texture_flat']
        ps = model.config.texture_encode_patch_size
        m = jnp.asarray(texture_patch_mask(ps), flat.dtype)
        return flat[..., None, None] * m

    def loss_fn(params, batch, dropout_rng=None):
        imgs = render_fn(
            params, batch['triangles'], batch_texture(batch), batch['mask'],
            batch['vn'], batch['c2w'], batch['fov'],
            model=model, resolution=tc.resolution,
            dtype=dtype, view_dtype=view_dtype, impl=impl,
            dropout_rng=dropout_rng)
        loss = jnp.mean(jnp.square(imgs - batch['gt'].astype(imgs.dtype)))
        return loss, imgs

    def make_shadow(params):
        return make_shadow_tree(params, tc)

    use_shadow = tc.bf16_shadow_params and (
        dtype != jnp.float32 or view_dtype != jnp.float32)

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict]:
        rng = (jax.random.fold_in(jax.random.key(tc.seed), state.step)
               if use_dropout else None)
        if use_shadow:
            # differentiate w.r.t. the compute-dtype shadow: the
            # fwd+bwd never touch the fp32 masters (no in-graph cast or
            # cast-VJP over 205M params); the optimizer epilogue updates
            # the masters in fp32 and re-casts the shadow once
            shadow = (state.shadow if state.shadow is not None
                      else make_shadow(state.params))
            (loss, _), grads_s = jax.value_and_grad(
                loss_fn, has_aux=True)(shadow, batch, rng)
            grads = jax.tree.map(lambda g, p: g.astype(p.dtype),
                                 grads_s, state.params)
        else:
            (loss, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, batch, rng)
        gnorm = optax.global_norm(grads)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        if tc.skip_nonfinite:
            # NaN/Inf loss -> skip the update (reference skips the batch,
            # train.py:404-407) — as a jit-compatible select.
            ok = jnp.isfinite(loss) & jnp.isfinite(gnorm)
            new_params = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_params,
                state.params)
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old) if
                hasattr(new, 'shape') else new, new_opt, state.opt_state)

        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1,
                               shadow=(make_shadow(new_params)
                                       if use_shadow else None))
        metrics = {'loss': loss, 'grad_norm': gnorm}
        return new_state, metrics

    def eval_step(params, batch):
        """Per-sample MSE weighted by the optional ``valid`` mask so a
        partial final batch padded by the dataset (pad_last) counts each
        real sample exactly once — the reference validates every sample
        (train.py:508-584).  Returns the weighted sum and count so the
        caller can average across batches of different real sizes."""
        _, imgs = loss_fn(params, batch)
        sq = jnp.square(imgs - batch['gt'].astype(imgs.dtype))
        per_sample = jnp.mean(sq.reshape(sq.shape[0], -1), axis=-1)  # [B]
        valid = batch.get('valid')
        if valid is None:
            valid = jnp.ones_like(per_sample)
        valid = valid.astype(per_sample.dtype)
        return {'loss_sum': jnp.sum(per_sample * valid),
                'n': jnp.sum(valid),
                'loss': (jnp.sum(per_sample * valid)
                         / jnp.maximum(jnp.sum(valid), 1.0))}

    return train_step, eval_step
