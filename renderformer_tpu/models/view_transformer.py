"""Stage 2: view-dependent ray decoding (parity with
/root/reference/renderformer/models/view_transformer.py:12-127).

Ray map -> NeRF PE -> 8x8 patchify -> cross/self-attn decoder over the
stage-1 triangle tokens -> DPT (or linear) head -> ELU(1e-3).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from renderformer_tpu.config import RenderFormerConfig
from renderformer_tpu.encodings.nerf import nerf_encode, nerf_out_dim
from renderformer_tpu.nn.attention import TransformerDecoder
from renderformer_tpu.nn.core import apply_norm, dense, dense_init, elu, norm_init
from renderformer_tpu.nn.dpt import DPTHead
from renderformer_tpu.parallel.sharding import constrain


@dataclass(frozen=True)
class ViewTransformer:
    config: RenderFormerConfig
    remat: bool = False

    @property
    def decoder(self) -> TransformerDecoder:
        cfg = self.config
        return TransformerDecoder(
            remat=self.remat,
            num_layers=cfg.view_transformer_n_layers,
            num_heads=cfg.view_transformer_n_heads,
            hidden_dim=cfg.view_transformer_latent_dim,
            ctx_dim=cfg.latent_dim,
            ffn_hidden_dim=cfg.view_transformer_ffn_hidden_dim,
            include_self_attn=cfg.view_transformer_include_self_attn,
            use_swin_attn=cfg.view_transformer_use_swin_attn,
            activation=cfg.activation,
            norm_type=cfg.norm_type,
            bias=cfg.bias,
            qk_norm=cfg.qk_norm,
            rope_dim=cfg.view_rope_dim,
            rope_type=cfg.rope_type,
            rope_double_max_freq=cfg.rope_double_max_freq,
            dropout=cfg.dropout,
        )

    @property
    def dpt(self) -> DPTHead:
        cfg = self.config
        return DPTHead(
            in_channels=cfg.view_transformer_latent_dim,
            features=cfg.dpt_features,
            out_channels=tuple(cfg.dpt_out_channels),
            out_dim=cfg.out_dim,
        )

    def init(self, key):
        cfg = self.config
        keys = jax.random.split(key, 6)
        vdir_dim = nerf_out_dim(3, cfg.vdir_num_freqs, include_input=True)
        params = {
            'ray_map_patch_token': jax.random.normal(
                keys[0], (1, 1, cfg.view_transformer_latent_dim)),
            'ray_map_encoder': dense_init(
                keys[1], vdir_dim * cfg.patch_size * cfg.patch_size,
                cfg.view_transformer_latent_dim, bias=True),
            'ray_map_encoder_norm': norm_init(
                cfg.norm_type, cfg.view_transformer_latent_dim),
            'transformer': self.decoder.init(keys[2]),
        }
        if cfg.pe_type == 'nerf':
            pe_dim = nerf_out_dim(9, cfg.vertex_pe_num_freqs, include_input=True)
            params['pe_token_proj'] = dense_init(
                keys[3], pe_dim, cfg.view_transformer_latent_dim, bias=True)
            params['token_pos_pe_norm'] = norm_init(
                cfg.norm_type, cfg.view_transformer_latent_dim)
        if cfg.use_dpt_decoder:
            params['out_dpt'] = self.dpt.init(keys[4])
        else:
            params['out_proj'] = dense_init(
                keys[5], cfg.view_transformer_latent_dim,
                cfg.patch_size * cfg.patch_size * cfg.out_dim, bias=True)
        return params

    def __call__(self, params, camera_o, ray_map, tri_tokens, tri_pos,
                 valid_mask, impl='xla', dtype=jnp.float32, dropout_rng=None):
        """
        Args:
            camera_o:  [B, 3] camera origins.
            ray_map:   [B, H, W, 3] unit ray directions.
            tri_tokens:[B or B/V, N_ctx, D] stage-1 output tokens.  A
                       batch that divides B means V views share one
                       scene's tokens; with pe_type='rope' they stay
                       un-fanned so the decoder's K/V projections run
                       once per scene (see MultiHeadAttention).
            tri_pos:   [B, N_ctx, 9] camera-space RoPE positions.
            valid_mask:[B, N_ctx] bool, True = attend.
            dtype:     stage-2 compute dtype (ref: fp32-TF32 / bf16).
        Returns:
            image [B, H, W, out_dim] (NHWC).
        """
        cfg = self.config
        p = cfg.patch_size
        b = ray_map.shape[0]
        if ray_map.ndim == 3:
            # pre-patched rays [B, T, c*p*p] from generate_rays_patched
            # (the '(c p1 p2)' kernel row order was baked into the ray
            # generator's static pixel tables — no transpose anywhere).
            # Only valid when the vdir encoding is identity.
            assert cfg.vdir_num_freqs == 0, (
                'pre-patched ray maps require identity vdir encoding')
            n_tok = ray_map.shape[1]
            patch_h = patch_w = int(round(n_tok ** 0.5))
            assert patch_h * patch_w == n_tok, ray_map.shape
            enc = (ray_map.astype(dtype)
                   @ params['ray_map_encoder']['kernel'].astype(dtype))
            enc = enc + params['ray_map_encoder']['bias'].astype(enc.dtype)
        else:
            _, h, w, _ = ray_map.shape
            patch_h, patch_w = h // p, w // p

            # vdir NeRF PE (identity at default vdir_num_freqs=0)
            ray_map = nerf_encode(ray_map, cfg.vdir_num_freqs,
                                  include_input=True)
            c = ray_map.shape[-1]
            # patchify 'b (h1 p1) (w1 p2) c -> b (h1 w1) (c p1 p2)' FUSED
            # into the encoder matmul: a multi-dim-contraction dot over
            # (c, p1, p2) on the 6-D reshape view lets the MXU emitter
            # read the strides directly instead of materializing the
            # transposed patch tensor (~0.9 ms of layout copies at 512^2
            # in the device profile).
            x = ray_map.reshape(b, patch_h, p, patch_w, p, c).astype(dtype)
            kern = params['ray_map_encoder']['kernel'].reshape(
                c, p, p, -1).astype(dtype)
            enc = jnp.einsum('bhpwqc,cpqd->bhwd', x, kern)
            enc = enc.reshape(b, patch_h * patch_w, -1)
            enc = enc + params['ray_map_encoder']['bias'].astype(enc.dtype)
        ray_tokens = params['ray_map_patch_token'].astype(dtype) + apply_norm(
            cfg.norm_type, params['ray_map_encoder_norm'], enc)
        ray_tokens = constrain(ray_tokens, 'ray_tokens')
        n_patches = ray_tokens.shape[1]

        # RoPE position of ray tokens: camera origin tiled x3 -> 9 coords
        ray_token_pos = jnp.tile(camera_o[:, None, :], (1, n_patches, 3))

        if cfg.pe_type == 'nerf':
            pos_pe = lambda t: apply_norm(
                cfg.norm_type, params['token_pos_pe_norm'],
                dense(params['pe_token_proj'],
                      nerf_encode(t, cfg.vertex_pe_num_freqs,
                                  include_input=True).astype(dtype)))
            ray_tokens = ray_tokens + pos_pe(ray_token_pos)
            if tri_tokens.shape[0] != b:
                # nerf PE is camera-dependent: fan the shared tokens out
                # per view before adding it
                reps = b // tri_tokens.shape[0]
                tri_tokens = jnp.broadcast_to(
                    tri_tokens[:, None],
                    (tri_tokens.shape[0], reps) + tri_tokens.shape[1:]
                ).reshape(b, *tri_tokens.shape[1:])
            tri_tokens = tri_tokens + pos_pe(tri_pos)

        tri_tokens = tri_tokens.astype(dtype)

        out_layers = tuple(cfg.dpt_tap_layers()) if cfg.use_dpt_decoder else ()
        seq, taps = self.decoder(
            params['transformer'], ray_tokens, tri_tokens,
            mask=valid_mask, triangle_pos=tri_pos, ray_pos=ray_token_pos,
            out_layers=out_layers, patch_h=patch_h, patch_w=patch_w, impl=impl,
            dropout_rng=dropout_rng)

        if cfg.use_dpt_decoder:
            # DPT runs in the stage-2 dtype, like the reference where it
            # sits inside the view-transformer autocast
            # (view_transformer.py:119-121); fp32 accumulation in convs.
            img = self.dpt(params['out_dpt'], taps,
                           patch_h, patch_w, patch_size=p)
            img = img.astype(jnp.float32)
            return constrain(elu(img, alpha=1e-3), 'image')
        # linear head: unpatchify
        dec = elu(dense(params['out_proj'], seq), alpha=1e-3)
        od = cfg.out_dim
        # 'b (h1 w1) (c p1 p2) -> b (h1 p1) (w1 p2) c' (NHWC output)
        dec = dec.reshape(b, patch_h, patch_w, od, p, p)
        dec = dec.transpose(0, 1, 4, 2, 5, 3)
        return dec.reshape(b, patch_h * p, patch_w * p, od)
