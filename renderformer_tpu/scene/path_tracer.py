"""TPU-native Monte-Carlo path tracer — an EXECUTABLE ground-truth
renderer for the dataset pipeline.

The reference's GT comes from Blender/blenderproc path tracing
(/root/reference/scene_processor/render_scene.py:10-97,
/root/reference/generate_dataset.py:342-386) — a subprocess this
environment cannot run.  This module computes the same light transport
(area-light path tracing with next-event estimation over emissive
triangles, Lambertian BRDF from the scene's per-triangle diffuse color)
as batched JAX ops that run on the TPU itself: ray-triangle intersection
is a [rays x tris] Möller-Trumbore sweep chunked through a lax.scan (MXU
/ VPU friendly, static shapes), bounces are a lax.scan over depth, and
samples accumulate in a running mean.

This makes `generate_dataset.py --gt_mode pathtrace` a physically-based
GT source with zero external dependencies — the dataset -> fine-tune
loop runs end to end on one TPU.

Scope (documented, matching the training-data envelope of
/root/reference/README.md:308-311): triangle soups <=8k tris, constant
per-face materials, black environment.  Radiance is returned in linear
HDR, same convention as RenderFormer's decoded output.

v2 (VERDICT r4 next #2) matches the reference's principled-BSDF
material mapping (/root/reference/scene_processor/render_scene.py:45-57:
Base Color = diffuse, Roughness, Specular IOR Level = mean(specular),
Metallic = 0, Emission):
  * GGX microfacet specular lobe (Trowbridge-Reitz D, Smith separable
    G, Schlick Fresnel with F0 = 0.08 * specular_level — the standard
    Blender/Disney "Specular" scaling where 0.5 -> F0 = 0.04);
  * barycentric-interpolated SHADING normals from the H5 `vn` field
    (smooth-shaded objects shade smoothly; flat-shaded scenes store the
    face normal at all three vertices so behavior is unchanged);
  * multiple importance sampling: NEE light samples and BSDF samples
    (cosine-diffuse / GGX-NDF lobe mixture) combined with the power
    heuristic, so small bright lights on near-specular surfaces
    converge (the veach-mis failure mode of NEE-only estimators).
Passing specular=None keeps the exact v1 Lambertian estimator.
Single-scattering GGX only (no multiple-scattering energy
compensation) and no refraction/transmission — documented limits.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-6


# ---------------------------------------------------------------------------
# Intersection
# ---------------------------------------------------------------------------

def _mt_chunk(rays_o, rays_d, wo, tri_pre, valid):
    """Möller-Trumbore for one triangle chunk, determinant form.

    Every [R, C] term is a [R, 3] @ [3, C] matmul against PRECOMPUTED
    per-triangle vectors — no [R, C, 3] cross-product intermediates
    (the naive form moved 3x the bytes and ran on VPU cross products;
    this form is a handful of thin matmuls + one fused elementwise
    epilogue):

        a     = det[e1, d, e2]        = -(d @ n2)      n2 = e1 x e2
        t_num = det[s, e1, e2]        = o @ n2 - c0    c0 = v0 . n2
        u_num = det[s, d, e2]         = wo @ e2 - d @ m2,  m2 = e2 x v0
        v_num = det[d, s, e1]         = d @ m1 - wo @ e1,  m1 = e1 x v0
    with s = o - v0 and the per-ray vector wo = o x d.

    rays_o/rays_d/wo [R, 3]; tri_pre = (e1T, e2T, n2T, m1T, m2T, c0)
    with *T [3, C] and c0 [C]; valid [C].  Returns t [R, C] (+inf where
    missed).
    """
    e1t, e2t, n2t, m1t, m2t, c0 = tri_pre
    a = -(rays_d @ n2t)                                      # [R, C]
    t_num = rays_o @ n2t - c0[None, :]
    u_num = wo @ e2t - rays_d @ m2t
    v_num = rays_d @ m1t - wo @ e1t
    inv = jnp.where(jnp.abs(a) > EPS,
                    1.0 / jnp.where(jnp.abs(a) > EPS, a, 1.0), 0.0)
    t = t_num * inv
    u = u_num * inv
    v = v_num * inv
    ok = ((jnp.abs(a) > EPS) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t > 1e-4) & valid[None, :])
    return jnp.where(ok, t, jnp.inf)


def _tri_precompute(tris, mask, chunk: int):
    """Pad the soup to a chunk multiple and precompute the transposed
    per-triangle vectors the determinant-form MT consumes.  Returns
    (xs, nc) ready for lax.scan over chunks."""
    n = tris.shape[0]
    pad = (-n) % chunk
    if pad:
        tris = jnp.concatenate(
            [tris, jnp.zeros((pad, 3, 3), tris.dtype)], axis=0)
        mask = jnp.concatenate([mask, jnp.zeros((pad,), bool)])
    nc = tris.shape[0] // chunk
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    n2 = jnp.cross(e1, e2)
    m1 = jnp.cross(e1, v0)
    m2 = jnp.cross(e2, v0)
    c0 = jnp.sum(v0 * n2, axis=-1)

    def chunked_t(x):   # [NC*chunk, 3] -> [nc, 3, chunk]
        return x.reshape(nc, chunk, 3).transpose(0, 2, 1)

    xs = (chunked_t(e1), chunked_t(e2), chunked_t(n2), chunked_t(m1),
          chunked_t(m2), c0.reshape(nc, chunk), mask.reshape(nc, chunk),
          jnp.arange(nc, dtype=jnp.int32) * chunk)
    return xs, nc


def intersect(rays_o, rays_d, tris, mask, chunk: int = 512, pre=None):
    """Nearest hit of each ray against the triangle soup.

    rays_o/rays_d [R, 3]; tris [N, 3, 3]; mask [N] bool.
    Returns (t [R], tri_idx [R] int32, hit [R] bool).  Chunked over
    triangles through a lax.scan so peak memory is [R, chunk].
    ``pre`` (from _tri_precompute) reuses the per-triangle vectors
    across bounces/samples.
    """
    if pre is None:
        pre, _ = _tri_precompute(tris, mask, chunk)
    wo = jnp.cross(rays_o, rays_d)

    def body(carry, xs):
        best_t, best_i = carry
        e1t, e2t, n2t, m1t, m2t, c0, cvalid, base = xs
        t = _mt_chunk(rays_o, rays_d, wo,
                      (e1t, e2t, n2t, m1t, m2t, c0), cvalid)
        tmin = jnp.min(t, axis=1)
        imin = jnp.argmin(t, axis=1).astype(jnp.int32) + base
        better = tmin < best_t
        return (jnp.where(better, tmin, best_t),
                jnp.where(better, imin, best_i)), None

    (t, idx), _ = jax.lax.scan(
        body, (jnp.full(rays_o.shape[:1], jnp.inf),
               jnp.zeros(rays_o.shape[:1], jnp.int32)), pre)
    return t, idx, jnp.isfinite(t)


def occluded(rays_o, rays_d, max_t, tris, mask, chunk: int = 512,
             pre=None):
    """True where the segment [o, o + max_t*d) hits any triangle."""
    t, _, hit = intersect(rays_o, rays_d, tris, mask, chunk, pre=pre)
    return hit & (t < max_t * (1.0 - 1e-3))


# ---------------------------------------------------------------------------
# Sampling helpers
# ---------------------------------------------------------------------------

def _onb(n):
    """Orthonormal basis around unit normals n [R, 3] (Frisvad)."""
    sign = jnp.where(n[:, 2] >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n[:, 2])
    b = n[:, 0] * n[:, 1] * a
    t1 = jnp.stack([1.0 + sign * n[:, 0] ** 2 * a, sign * b,
                    -sign * n[:, 0]], axis=-1)
    t2 = jnp.stack([b, sign + n[:, 1] ** 2 * a, -n[:, 1]], axis=-1)
    return t1, t2


def _cosine_sample(key, n):
    """Cosine-weighted hemisphere directions around normals n [R, 3]."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, n.shape[:1])
    u2 = jax.random.uniform(k2, n.shape[:1])
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    t1, t2 = _onb(n)
    d = (r[:, None] * jnp.cos(phi)[:, None] * t1
         + r[:, None] * jnp.sin(phi)[:, None] * t2
         + jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))[:, None] * n)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _ggx_sample(key, n, wo, alpha):
    """Sample wi by reflecting wo about a GGX-NDF half-vector around
    unit normals n [R, 3]; alpha [R]."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, n.shape[:1])
    u2 = jax.random.uniform(k2, n.shape[:1])
    a2 = alpha * alpha
    cth = jnp.sqrt(jnp.clip((1.0 - u1) / (1.0 + (a2 - 1.0) * u1),
                            0.0, 1.0))
    sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
    phi = 2.0 * jnp.pi * u2
    t1, t2 = _onb(n)
    h = (sth[:, None] * jnp.cos(phi)[:, None] * t1
         + sth[:, None] * jnp.sin(phi)[:, None] * t2
         + cth[:, None] * n)
    wi = 2.0 * jnp.sum(wo * h, axis=-1, keepdims=True) * h - wo
    return wi / jnp.maximum(
        jnp.linalg.norm(wi, axis=-1, keepdims=True), EPS)


def _ggx_d(nh, alpha):
    """Trowbridge-Reitz NDF; nh, alpha [R]."""
    a2 = alpha * alpha
    den = nh * nh * (a2 - 1.0) + 1.0
    return a2 / jnp.maximum(jnp.pi * den * den, EPS)


def _smith_g1(c, alpha):
    a2 = alpha * alpha
    return 2.0 * c / jnp.maximum(
        c + jnp.sqrt(a2 + (1.0 - a2) * c * c), EPS)


def _bsdf_eval_pdf(alb, f0, alpha, p_spec, n, wo, wi, has_specular):
    """Principled-lite BSDF (diffuse + GGX specular, metallic=0).

    alb [R,3]; f0/alpha/p_spec [R]; n/wo/wi [R,3] unit (n = shading
    normal, wo points AWAY from the surface toward the viewer).
    Returns (f [R,3], pdf [R]) with pdf matching the lobe-mixture
    sampler (p_spec GGX-NDF + (1-p_spec) cosine); both zero where the
    direction pair is invalid (below the hemisphere).
    """
    nwo = jnp.sum(n * wo, axis=-1)
    nwi = jnp.sum(n * wi, axis=-1)
    pdf_cos = jnp.maximum(nwi, 0.0) / jnp.pi
    if not has_specular:
        valid = (nwi > 0.0) & (nwo > 0.0)
        f = jnp.where(valid[:, None], alb / jnp.pi, 0.0)
        return f, jnp.where(valid, pdf_cos, 0.0)
    h = wo + wi
    h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), EPS)
    nh = jnp.clip(jnp.sum(n * h, axis=-1), 0.0, 1.0)
    hwo = jnp.clip(jnp.sum(h * wo, axis=-1), 0.0, 1.0)
    fres = f0 + (1.0 - f0) * (1.0 - hwo) ** 5
    d = _ggx_d(nh, alpha)
    g = (_smith_g1(jnp.clip(nwo, EPS, 1.0), alpha)
         * _smith_g1(jnp.clip(nwi, EPS, 1.0), alpha))
    spec = d * g * fres / jnp.maximum(4.0 * nwo * nwi, EPS)
    # diffuse-specular coupling: symmetric (1-F(n.wi))(1-F(n.wo))
    # keeps the lobe SUM energy-conserving (a plain (1-F(h.wo)) factor
    # measured +9% in the white-furnace test at F0=0.08; this form
    # measures within a few % low — losing a little energy is the safe
    # side for a GT renderer)
    k_in = 1.0 - (f0 + (1.0 - f0)
                  * (1.0 - jnp.clip(nwi, 0.0, 1.0)) ** 5)
    k_out = 1.0 - (f0 + (1.0 - f0)
                   * (1.0 - jnp.clip(nwo, 0.0, 1.0)) ** 5)
    f = alb / jnp.pi * (k_in * k_out)[:, None] + spec[:, None]
    pdf_ggx = d * nh / jnp.maximum(4.0 * hwo, EPS)
    pdf = p_spec * pdf_ggx + (1.0 - p_spec) * pdf_cos
    valid = (nwi > 0.0) & (nwo > 0.0)
    return (jnp.where(valid[:, None], f, 0.0),
            jnp.where(valid, pdf, 0.0))


def _power_heuristic(pa, pb):
    """Veach power heuristic (beta=2) for the pa-sampled strategy."""
    a2 = pa * pa
    return a2 / jnp.maximum(a2 + pb * pb, EPS)


# ---------------------------------------------------------------------------
# Path tracing
# ---------------------------------------------------------------------------

def _scene_arrays(tris, mask, diffuse, emissive):
    """Per-triangle derived quantities (normals, areas, light pdf)."""
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]
    fn = jnp.cross(e1, e2)
    area2 = jnp.linalg.norm(fn, axis=-1)                 # 2 * area
    normal = fn / jnp.maximum(area2, EPS)[:, None]
    area = 0.5 * area2
    lum = jnp.sum(emissive, axis=-1) * area * mask
    total = jnp.sum(lum)
    pdf = jnp.where(total > 0, lum / jnp.maximum(total, EPS), 0.0)
    return normal, area, pdf, total


@functools.partial(
    jax.jit,
    static_argnames=('resolution', 'spp', 'max_depth', 'chunk', 'nee',
                     'clamp'))
def path_trace(tris, vn, mask, diffuse, emissive, c2w, fov_rad, key,
               resolution: int = 256, spp: int = 64, max_depth: int = 3,
               chunk: int = 512, nee: bool = True,
               clamp: float = 0.0, specular=None, roughness=None):
    """Render one view with path tracing on the accelerator.

    tris [N,3,3] f32, vn [N,3,3] per-vertex shading normals (barycentric
    interpolated; flat-shaded scenes store the face normal three times),
    mask [N] bool, diffuse [N,3], emissive [N,3] (radiance),
    c2w [4,4], fov_rad scalar.  Returns HDR [res, res, 3] f32.

    ``specular`` [N] (Specular IOR Level, F0 = 0.08 * level) and
    ``roughness`` [N] enable the GGX lobe (v2); both None keeps the
    Lambertian BRDF.  Shading normals from vn are used either way.

    ``nee=False`` disables next-event estimation (emission collected on
    every hit — the brute-force estimator, same expectation, higher
    variance; used by tests to cross-check the NEE+MIS estimator).

    ``clamp`` > 0 clips each indirect light contribution elementwise —
    NEE samples and non-primary BSDF-sample emission pickups alike
    (firefly suppression — the standard slightly-biased radiance clamp;
    0 keeps the estimator unbiased).  Primary-hit emission is never
    clamped.
    """
    res = resolution
    has_spec = specular is not None
    normal, area, light_pdf, light_total = _scene_arrays(
        tris, mask, diffuse, emissive)
    if has_spec:
        f0_tri = 0.08 * jnp.clip(specular, 0.0, None)
        alpha_tri = jnp.clip(roughness * roughness, 1e-4, 1.0)
    else:
        f0_tri = jnp.zeros(tris.shape[:1])
        alpha_tri = jnp.ones(tris.shape[:1])
    pre, _ = _tri_precompute(tris, mask, chunk)  # shared by all rays

    # primary rays — EXACTLY utils/rays.py's Blender convention
    # (-Z forward): dirs = [(x-cx)/f, -(y-cy)/f, -1], rotated by c2w
    key, kj = jax.random.split(key)

    def render_sample(key):
        k_jit, k_path = jax.random.split(key)
        jx = jax.random.uniform(k_jit, (res, res, 2))
        ii = (jnp.arange(res, dtype=jnp.float32)[:, None]
              + jx[..., 0]) / res * 2.0 - 1.0      # y in [-1, 1)
        jj = (jnp.arange(res, dtype=jnp.float32)[None, :]
              + jx[..., 1]) / res * 2.0 - 1.0      # x
        tanh = jnp.tan(fov_rad / 2.0)
        dirs = jnp.stack(
            [jj * tanh, -ii * tanh, -jnp.ones_like(ii)], axis=-1)
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        rays_d = jnp.einsum('ij,hwj->hwi', c2w[:3, :3], dirs).reshape(-1, 3)
        rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)

        r = rays_d.shape[0]
        radiance = jnp.zeros((r, 3))
        throughput = jnp.ones((r, 3))
        alive = jnp.ones((r,), bool)
        o, d = rays_o, rays_d
        # solid-angle pdf of the strategy that produced the current ray;
        # -1 = deterministic (primary) -> emission weighted 1
        prev_pdf = jnp.full((r,), -1.0)

        def bounce(carry, xs):
            kd, is_last = xs
            o, d, radiance, throughput, alive, prev_pdf = carry
            t, idx, hit = intersect(o, d, tris, mask, chunk, pre=pre)
            hit = hit & alive
            p = o + t[:, None] * jnp.where(hit[:, None], d, 0.0)
            n_g = normal[idx]
            # face the incoming ray
            flip = (jnp.sum(n_g * d, axis=-1) > 0)
            n_g = jnp.where(flip[:, None], -n_g, n_g)

            # barycentrics of the hit -> interpolated SHADING normal
            # (one triangle per ray: classic MT, cheap at [R,3])
            tv = tris[idx]
            e1 = tv[:, 1] - tv[:, 0]
            e2 = tv[:, 2] - tv[:, 0]
            sv = o - tv[:, 0]
            pv = jnp.cross(d, e2)
            det = jnp.sum(e1 * pv, axis=-1)
            inv = jnp.where(jnp.abs(det) > EPS, 1.0 / jnp.where(
                jnp.abs(det) > EPS, det, 1.0), 0.0)
            bu = jnp.sum(sv * pv, axis=-1) * inv
            bv = jnp.sum(d * jnp.cross(sv, e1), axis=-1) * inv
            vns = vn[idx]
            ns = (vns[:, 0] * (1.0 - bu - bv)[:, None]
                  + vns[:, 1] * bu[:, None] + vns[:, 2] * bv[:, None])
            nsl = jnp.linalg.norm(ns, axis=-1)
            ns = jnp.where((nsl > 1e-4)[:, None],
                           ns / jnp.maximum(nsl, EPS)[:, None], n_g)
            # keep the shading normal on the geometric side we shade
            ns = jnp.where(
                (jnp.sum(ns * n_g, axis=-1) < 0)[:, None], -ns, ns)

            alb = diffuse[idx]
            emis = emissive[idx]
            f0 = f0_tri[idx]
            alpha = alpha_tri[idx]
            wo = -d
            nwo = jnp.clip(jnp.sum(ns * wo, axis=-1), 0.0, 1.0)
            if has_spec:
                # lobe-selection probability from view-angle Fresnel vs
                # diffuse albedo weight
                f_view = f0 + (1.0 - f0) * (1.0 - nwo) ** 5
                w_d = jnp.mean(alb, axis=-1) * (1.0 - f_view)
                p_spec = f_view / jnp.maximum(f_view + w_d, EPS)
                p_spec = jnp.clip(p_spec, 0.0, 0.98)
            else:
                p_spec = jnp.zeros((r,))

            # emission at the hit: MIS-weighted against the NEE strategy
            # that could have sampled this same light point
            if nee:
                cos_l = jnp.abs(jnp.sum(normal[idx] * d, axis=-1))
                pdf_l_here = (light_pdf[idx] / jnp.maximum(area[idx], EPS)
                              * t * t / jnp.maximum(cos_l, EPS))
                w_emis = jnp.where(
                    (prev_pdf < 0) | (pdf_l_here <= 0), 1.0,
                    _power_heuristic(jnp.maximum(prev_pdf, 0.0),
                                     pdf_l_here))
            else:
                w_emis = jnp.ones((r,))
            emis_contrib = throughput * emis * w_emis[:, None]
            if clamp > 0.0:
                # the firefly clamp must also cover the BSDF-sampled
                # emission pickup (the dominant spike source once the
                # GGX lobe routes small bright lights through the BSDF
                # strategy); primary hits (prev_pdf < 0) stay unclamped
                # so looking straight at a light reads its radiance
                emis_contrib = jnp.where(
                    (prev_pdf >= 0)[:, None],
                    jnp.minimum(emis_contrib, clamp), emis_contrib)
            radiance = radiance + jnp.where(
                hit[:, None], emis_contrib, 0.0)

            k_light, k_uv, k_dir, k_lobe = jax.random.split(kd, 4)
            if nee:
                # --- next-event estimation over emissive triangles ---
                li = jax.random.categorical(
                    k_light, jnp.log(jnp.maximum(light_pdf, 1e-30)),
                    shape=(r,))
                u12 = jax.random.uniform(k_uv, (r, 2))
                su = jnp.sqrt(u12[:, 0])
                b0 = 1.0 - su
                b1 = u12[:, 1] * su
                lp = (tris[li, 0] * b0[:, None] + tris[li, 1] * b1[:, None]
                      + tris[li, 2] * (1.0 - b0 - b1)[:, None])
                ln = normal[li]
                wi = lp - p
                dist = jnp.linalg.norm(wi, axis=-1)
                wi = wi / jnp.maximum(dist, EPS)[:, None]
                cos_s = jnp.sum(ns * wi, axis=-1)
                cos_l = jnp.abs(jnp.sum(ln * wi, axis=-1))
                # solid-angle pdf of the sampled light point
                pdf_a = light_pdf[li] / jnp.maximum(area[li], EPS)
                pdf_l = pdf_a * dist * dist / jnp.maximum(cos_l, EPS)
                f_l, pdf_b_l = _bsdf_eval_pdf(
                    alb, f0, alpha, p_spec, ns, wo, wi, has_spec)
                nee_valid = (hit & (cos_s > 0) & (pdf_a > 0)
                             & (jnp.sum(emissive[li], axis=-1) > 0))
                shadow_o = p + n_g * 1e-3
                shad = occluded(shadow_o, wi, dist - 2e-3, tris, mask,
                                chunk, pre=pre)
                # On the FINAL bounce the complementary BSDF-sample
                # emission pickup never runs (the scan ends), so NEE
                # must carry the full weight there or the deepest
                # vertex's direct light is systematically undercounted.
                w_mis = jnp.where(is_last > 0, 1.0,
                                  _power_heuristic(pdf_l, pdf_b_l))
                contrib = (throughput * f_l * emissive[li]
                           * (cos_s * w_mis
                              / jnp.maximum(pdf_l, EPS))[:, None])
                if clamp > 0.0:
                    contrib = jnp.minimum(contrib, clamp)
                radiance = radiance + jnp.where(
                    (nee_valid & ~shad)[:, None], contrib, 0.0)

            # --- continue the path: sample the BSDF lobe mixture ---
            d_diff = _cosine_sample(k_dir, ns)
            if has_spec:
                k_gl, k_gs = jax.random.split(k_lobe)
                d_spec = _ggx_sample(k_gs, ns, wo, alpha)
                take_spec = jax.random.uniform(k_gl, (r,)) < p_spec
                new_d = jnp.where(take_spec[:, None], d_spec, d_diff)
            else:
                new_d = d_diff
            f_s, pdf_s = _bsdf_eval_pdf(
                alb, f0, alpha, p_spec, ns, wo, new_d, has_spec)
            nwi_s = jnp.clip(jnp.sum(ns * new_d, axis=-1), 0.0, 1.0)
            weight = jnp.where(
                (pdf_s > EPS)[:, None],
                f_s * (nwi_s / jnp.maximum(pdf_s, EPS))[:, None], 0.0)
            new_o = p + n_g * 1e-3
            throughput = throughput * jnp.where(hit[:, None], weight, 0.0)
            alive = hit & (jnp.max(throughput, axis=-1) > 1e-4)
            return (new_o, new_d, radiance, throughput, alive,
                    jnp.where(hit, pdf_s, -1.0)), None

        keys = jax.random.split(k_path, max_depth)
        is_last = jnp.arange(max_depth) == max_depth - 1
        (o, d, radiance, throughput, alive, _), _ = jax.lax.scan(
            bounce, (o, d, radiance, throughput, alive, prev_pdf),
            (keys, is_last))
        return radiance.reshape(res, res, 3)

    def spp_body(carry, key):
        acc, i = carry
        s = render_sample(key)
        return (acc + (s - acc) / (i + 1.0), i + 1.0), None

    keys = jax.random.split(kj, spp)
    (img, _), _ = jax.lax.scan(
        spp_body, (jnp.zeros((res, res, 3)), jnp.array(0.0)), keys)
    return img


# ---------------------------------------------------------------------------
# Scene-level convenience (H5 contract)
# ---------------------------------------------------------------------------

def texture_to_materials(texture, patch_mask: Optional[np.ndarray] = None):
    """Per-face constant materials from 13-channel patches [N,13,ps,ps]:
    mean over the valid (lower-triangle, x+y<=ps) texel region.

    Channel layout (/root/reference/scene_processor/to_h5.py:63):
    0-2 diffuse, 3-5 specular, 6 roughness, 7-9 normal, 10-12 emissive.
    Returns (diffuse [N,3], specular_level [N] — mean of the specular
    channels, the reference's Specular IOR Level mapping
    (render_scene.py:49-50) — roughness [N], emissive [N,3])."""
    tex = jnp.asarray(texture)
    ps = tex.shape[-1]
    if patch_mask is None:
        ii = np.arange(ps)
        patch_mask = (ii[:, None] + ii[None, :]) <= ps
    m = jnp.asarray(patch_mask, tex.dtype)
    denom = jnp.maximum(m.sum(), 1.0)
    means = (tex * m).sum(axis=(-1, -2)) / denom       # [N, 13]
    return (means[:, 0:3], jnp.mean(means[:, 3:6], axis=-1),
            means[:, 6], means[:, 10:13])


def render_scene_pathtrace(scene: dict, view: int = 0,
                           resolution: int = 256, spp: int = 64,
                           max_depth: int = 3, seed: int = 0,
                           clamp: float = 0.0, lambertian: bool = False):
    """Path-trace one view of a loaded H5 scene dict
    (io/h5.load_scene_h5 layout).  Returns HDR [res, res, 3] numpy.
    ``lambertian`` forces the v1 diffuse-only estimator (the default
    uses the scene's specular/roughness through the GGX lobe)."""
    diffuse, spec, rough, emissive = texture_to_materials(scene['texture'])
    fov = np.deg2rad(np.asarray(scene['fov']).reshape(-1)[view])
    img = path_trace(
        jnp.asarray(scene['triangles'], jnp.float32),
        jnp.asarray(scene['vn'], jnp.float32),
        jnp.asarray(scene['mask'], bool),
        diffuse.astype(jnp.float32), emissive.astype(jnp.float32),
        jnp.asarray(scene['c2w'][view], jnp.float32),
        jnp.float32(fov), jax.random.key(seed),
        resolution=resolution, spp=spp, max_depth=max_depth, clamp=clamp,
        specular=None if lambertian else spec.astype(jnp.float32),
        roughness=None if lambertian else rough.astype(jnp.float32))
    return np.asarray(img)
