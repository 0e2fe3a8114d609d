"""RenderFormer core model: view-independent triangle light transport
(stage 1) + dispatch into the view-dependent decoder (stage 2).

Parity with /root/reference/renderformer/models/renderformer.py:13-206,
TPU-first: per-view fan-out uses broadcast (no repeat_interleave copies),
register-token RoPE positions come from the mask-weighted scene centroid
computed in fp32.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from renderformer_tpu.config import RenderFormerConfig
from renderformer_tpu.encodings.nerf import nerf_encode, nerf_out_dim
from renderformer_tpu.nn.attention import TransformerEncoder
from renderformer_tpu.nn.core import apply_norm, dense, dense_init, norm_init
from renderformer_tpu.models.view_transformer import ViewTransformer
from renderformer_tpu.parallel.sharding import constrain


@dataclass(frozen=True)
class RenderFormer:
    config: RenderFormerConfig
    # gradient checkpointing on every transformer block (reference
    # train.py:302-305); affects autodiff memory only, not values.
    remat: bool = False

    @property
    def encoder(self) -> TransformerEncoder:
        cfg = self.config
        return TransformerEncoder(
            num_layers=cfg.num_layers,
            num_heads=cfg.num_heads,
            hidden_dim=cfg.latent_dim,
            ffn_hidden_dim=cfg.dim_feedforward,
            activation=cfg.activation,
            norm_type=cfg.norm_type,
            bias=cfg.bias,
            qk_norm=cfg.view_indep_qk_norm,
            rope_dim=cfg.rope_dim,
            rope_type=cfg.rope_type,
            rope_double_max_freq=cfg.rope_double_max_freq,
            dropout=cfg.dropout,
            remat=self.remat,
        )

    @property
    def view_transformer(self) -> ViewTransformer:
        return ViewTransformer(self.config, remat=self.remat)

    def init(self, key):
        cfg = self.config
        keys = jax.random.split(key, 8)
        tex_in = (cfg.texture_channels * cfg.texture_encode_patch_size
                  * cfg.texture_encode_patch_size)
        params = {
            'tri_token': jax.random.normal(keys[0], (1, 1, cfg.latent_dim)),
            'reg_tokens': jax.random.normal(
                keys[1], (1, cfg.num_register_tokens, cfg.latent_dim)),
            'texture_encoder': dense_init(keys[2], tex_in, cfg.latent_dim, bias=True),
            'texture_encoder_norm': norm_init(
                cfg.texture_encoder_norm_type, cfg.latent_dim),
            'transformer': self.encoder.init(keys[3]),
            'view_transformer': self.view_transformer.init(keys[4]),
        }
        if cfg.use_vn_encoder:
            vn_dim = nerf_out_dim(9, cfg.vn_pe_num_freqs, include_input=True)
            params['vn_encoding_proj'] = dense_init(
                keys[5], vn_dim, cfg.latent_dim, bias=True)
            params['vn_encoder_norm'] = norm_init(
                cfg.vn_encoder_norm_type, cfg.latent_dim)
        if cfg.pe_type == 'nerf':
            pe_dim = nerf_out_dim(9, cfg.vertex_pe_num_freqs, include_input=True)
            params['tri_encoding_proj'] = dense_init(
                keys[6], pe_dim, cfg.latent_dim, bias=True)
            params['tri_encoding_norm'] = norm_init(
                cfg.vn_encoder_norm_type, cfg.latent_dim)
        return params

    # ------------------------------------------------------------------
    def process_tri_vpos(
        self, tri_vpos: jnp.ndarray, valid_mask: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Prepend the mask-weighted scene centroid (tiled x3) as the RoPE
        position of the register tokens (renderformer.py:103-124). fp32,
        gradient-stopped."""
        n_reg = self.config.num_register_tokens
        pos = jax.lax.stop_gradient(tri_vpos.astype(jnp.float32))
        maskf = valid_mask.astype(jnp.float32)
        weight = maskf / (jnp.sum(maskf, axis=1, keepdims=True) + 1e-5)
        weighted = weight[..., None] * pos  # [B, N, 9]
        center = jnp.sum(weighted, axis=1).reshape(-1, 3, 3).mean(axis=1)  # [B, 3]
        center = jnp.tile(center[:, None, :], (1, n_reg, 3))  # [B, R, 9]
        pos_out = jnp.concatenate([center, pos], axis=1)
        mask_out = jnp.concatenate(
            [jnp.ones((pos.shape[0], n_reg), dtype=bool), valid_mask], axis=1)
        return pos_out, mask_out

    def construct_seq(self, params, tri_vpos, texture_patches, valid_mask, vns,
                      dtype=jnp.float32):
        """Build the stage-1 token sequence (renderformer.py:126-169).

        tri_vpos:        [B, N, 9]
        texture_patches: [B, N, C, ps, ps]
        valid_mask:      [B, N] bool
        vns:             [B, N, 9]
        Returns (seq [B, R+N, D], mask [B, R+N], rope_pos [B, R+N, 9]).
        """
        cfg = self.config
        b, n = tri_vpos.shape[0], tri_vpos.shape[1]

        if cfg.use_vn_encoder:
            vn_pe = nerf_encode(vns.astype(jnp.float32), cfg.vn_pe_num_freqs,
                                include_input=True).astype(dtype)
            vn_emb = apply_norm(cfg.vn_encoder_norm_type,
                                params.get('vn_encoder_norm', {}),
                                dense(params['vn_encoding_proj'], vn_pe))
        else:
            vn_emb = 0.0

        tex = texture_patches.reshape(b, n, -1).astype(dtype)
        tex_emb = apply_norm(cfg.texture_encoder_norm_type,
                             params['texture_encoder_norm'],
                             dense(params['texture_encoder'], tex))

        tri_emb = params['tri_token'].astype(dtype) + tex_emb + vn_emb
        if cfg.pe_type == 'nerf':
            pe = nerf_encode(tri_vpos.astype(jnp.float32),
                             cfg.vertex_pe_num_freqs,
                             include_input=True).astype(dtype)
            tri_emb = tri_emb + apply_norm(
                cfg.vn_encoder_norm_type, params.get('tri_encoding_norm', {}),
                dense(params['tri_encoding_proj'], pe))

        reg = jnp.broadcast_to(
            params['reg_tokens'].astype(dtype),
            (b, cfg.num_register_tokens, cfg.latent_dim))
        seq = jnp.concatenate([reg, tri_emb], axis=1)

        rope_pos, mask = self.process_tri_vpos(tri_vpos, valid_mask)
        return seq, mask, rope_pos

    # ------------------------------------------------------------------
    def __call__(self, params, tri_vpos, texture_patches, valid_mask, vns,
                 rays_o, rays_d, tri_vpos_view_tf,
                 impl: str = 'xla',
                 dtype=jnp.float32,
                 view_dtype: Optional[jnp.dtype] = None,
                 dropout_rng=None):
        """Full forward (renderformer.py:171-206).

        tri_vpos:         [B, N, 9]
        texture_patches:  [B, N, C, ps, ps]
        valid_mask:       [B, N] bool
        vns:              [B, N, 9]
        rays_o:           [B, V, 3]
        rays_d:           [B, V, H, W, 3]
        tri_vpos_view_tf: [B, V, N, 9] camera-space triangle positions
        Returns images [B, V, H, W, out_dim] (NHWC per view).
        """
        if view_dtype is None:
            view_dtype = dtype
        cfg = self.config

        # params in the compute dtype (stage 2 may differ); avoids mixed
        # bf16-x-fp32 matmuls that promote to fp32 on the MXU
        from renderformer_tpu.nn.core import cast_params
        view_params = cast_params(params['view_transformer'], view_dtype)
        params = {**cast_params(
            {k: v for k, v in params.items() if k != 'view_transformer'},
            dtype), 'view_transformer': view_params}

        enc_rng = view_rng = None
        if dropout_rng is not None and cfg.dropout > 0.0:
            enc_rng, view_rng = jax.random.split(dropout_rng)

        seq, mask_padded, rope_pos = self.construct_seq(
            params, tri_vpos, texture_patches, valid_mask, vns, dtype=dtype)
        seq = constrain(seq.astype(dtype), 'tokens')
        seq = self.encoder(params['transformer'], seq,
                           mask=mask_padded, triangle_pos=rope_pos, impl=impl,
                           dropout_rng=enc_rng)
        seq = constrain(seq, 'tokens')

        b, v = rays_o.shape[0], rays_o.shape[1]
        n_tok = seq.shape[1]

        # tokens are NOT fanned out over views: the decoder's K/V
        # projections consume them once per scene and broadcast the
        # projected K/V across views (MultiHeadAttention handles the
        # batch mismatch); masks and camera-space positions stay per view
        mask_bv = jnp.broadcast_to(mask_padded[:, None], (b, v, n_tok))
        mask_bv = mask_bv.reshape(b * v, n_tok)
        valid_bv = jnp.broadcast_to(valid_mask[:, None], (b, v, valid_mask.shape[1]))
        valid_bv = valid_bv.reshape(b * v, -1)

        rays_o_f = rays_o.reshape(b * v, 3)
        rays_d_f = rays_d.reshape(b * v, *rays_d.shape[2:])
        tri_view = tri_vpos_view_tf.reshape(b * v, *tri_vpos_view_tf.shape[2:])
        pos_seq, _ = self.process_tri_vpos(tri_view, valid_bv)

        img = self.view_transformer(
            params['view_transformer'], rays_o_f, rays_d_f,
            seq, pos_seq, mask_bv, impl=impl, dtype=view_dtype,
            dropout_rng=view_rng)
        return img.reshape(b, v, *img.shape[1:])
