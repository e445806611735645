"""Rasterizer correctness: vectorized JAX blend vs sequential numpy oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dqo_map_tpu.models.cameras import Camera
from dqo_map_tpu.ops.rasterize import RenderSettings, rasterize, eval_colors
from oracle_rasterizer import oracle_render


def make_scene(rng, P=60, W=48, H=32):
    c2w = np.eye(4)
    cam = Camera(uid=0, c2w=c2w, fx=40.0, fy=40.0, cx=W / 2, cy=H / 2,
                 width=W, height=H)
    means = np.zeros((P, 3))
    means[:, 0] = rng.uniform(-0.8, 0.8, P)
    means[:, 1] = rng.uniform(-0.5, 0.5, P)
    means[:, 2] = rng.uniform(1.0, 3.0, P)
    scales = np.exp(rng.uniform(np.log(0.02), np.log(0.12), (P, 3)))
    scales[:, 2] *= 0.1
    q = rng.normal(size=(P, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    opac = rng.uniform(0.3, 0.99, P)
    colors = rng.uniform(0, 1, (P, 3))
    return cam, means, scales, q, opac, colors


def _render_inputs_f64(cam):
    import math
    w2c = cam.w2c.astype(np.float64)
    return {
        "w2c": jnp.asarray(w2c),
        "cam_pos": jnp.asarray(cam.camera_center.astype(np.float64)),
        "full_proj": jnp.asarray(cam.projection_matrix.astype(np.float64) @ w2c),
        "K": jnp.asarray(cam.K.astype(np.float64)),
        "tan_fovx": jnp.float64(math.tan(cam.FoVx * 0.5)),
        "tan_fovy": jnp.float64(math.tan(cam.FoVy * 0.5)),
    }


def run_both(rng, tile_mask=None, opaque_threshold=0.6, x64=True, **scene_kw):
    """Render with the JAX path and the numpy oracle.

    x64=True runs the JAX path in float64 so the comparison isolates
    SEMANTICS from float32 conditioning (the CUDA reference is itself f32, so
    f32-vs-f64 differences of ~1% in ill-conditioned conics are expected and
    covered by the loose-tolerance f32 test).
    """
    cam, means, scales, q, opac, colors = make_scene(rng, **scene_kw)
    settings = RenderSettings(width=cam.width, height=cam.height, impl="ref",
                              opaque_threshold=opaque_threshold,
                              max_tiles_per_gaussian=16)
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", x64)
    try:
        dt = jnp.float64 if x64 else jnp.float32
        cam_in = _render_inputs_f64(cam) if x64 else cam.render_inputs()
        out = rasterize(
            jnp.asarray(means, dt), jnp.asarray(scales, dt),
            jnp.asarray(q, dt), jnp.asarray(opac, dt),
            jnp.asarray(colors, dt), cam_in, settings,
            tile_mask=None if tile_mask is None else jnp.asarray(tile_mask),
            normal_w=jnp.zeros((means.shape[0], 3), dt),
        )
        out = {k: np.asarray(v) for k, v in out.items()}
    finally:
        jax.config.update("jax_enable_x64", prev)
    ref = oracle_render(
        means, scales, q, opac, colors, cam.w2c.astype(np.float64),
        cam.full_proj.astype(np.float64), cam.K.astype(np.float64),
        cam.width, cam.height, opaque_threshold=opaque_threshold,
        tile_mask=tile_mask, max_tiles_per_gaussian=16,
    )
    return out, ref


def test_forward_matches_oracle(rng):
    out, ref = run_both(rng)
    np.testing.assert_allclose(out["render"], ref["render"], atol=1e-6)
    np.testing.assert_allclose(out["T_map"], ref["T_map"], atol=1e-6)
    np.testing.assert_allclose(out["weight_sum"], ref["weight_sum"], atol=1e-6)
    # integer index maps must be exact
    assert (out["depth_index_map"] == ref["depth_index_map"]).all()
    assert (out["color_index_map"] == ref["color_index_map"]).all()
    np.testing.assert_allclose(out["depth"], ref["depth"], atol=1e-6)
    np.testing.assert_allclose(out["depth_hit_weight"], ref["depth_hit_weight"], atol=1e-6)
    assert (out["n_touched"] == ref["n_touched"]).all()


def test_forward_f32_close(rng):
    # float32 end-to-end vs the f64 oracle: loose tolerance, matching the
    # conditioning of the f32 CUDA reference.
    out, ref = run_both(rng, x64=False)
    np.testing.assert_allclose(out["render"], ref["render"], atol=0.05)
    np.testing.assert_allclose(out["T_map"], ref["T_map"], atol=0.05)
    assert (out["depth_index_map"] == ref["depth_index_map"]).mean() > 0.98


def test_forward_with_tile_mask(rng):
    TH, TW = 2, 3
    tile_mask = np.zeros((TH, TW), np.int32)
    tile_mask[0, 1] = 1
    tile_mask[1, 2] = 1
    out, ref = run_both(rng, tile_mask=tile_mask)
    np.testing.assert_allclose(out["render"], ref["render"], atol=1e-6)
    # masked-off tiles render nothing
    assert np.abs(out["render"][:16, :16]).max() == 0.0


def test_gradients_flow_and_are_finite(rng):
    cam, means, scales, q, opac, colors = make_scene(rng, P=40)
    settings = RenderSettings(width=cam.width, height=cam.height, impl="ref")
    target = jnp.zeros((cam.height, cam.width, 3))
    tdepth = jnp.ones((cam.height, cam.width)) * 2.0

    def loss_fn(means, scales, q, opac, colors):
        out = rasterize(means, scales, q, opac, colors, cam.render_inputs(),
                        settings, normal_w=jnp.zeros_like(means))
        m = (out["depth_index_map"] >= 0)
        return (
            jnp.abs(out["render"] - target).mean()
            + jnp.where(m, jnp.abs(out["depth"] - tdepth), 0.0).mean()
        )

    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
        jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
        jnp.asarray(q, jnp.float32), jnp.asarray(opac, jnp.float32),
        jnp.asarray(colors, jnp.float32),
    )
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # color gradient must be nonzero somewhere
    assert np.abs(np.asarray(grads[4])).max() > 0
    # depth term must move means
    assert np.abs(np.asarray(grads[0])).max() > 0


def test_gradients_against_finite_difference(rng):
    cam, means, scales, q, opac, colors = make_scene(rng, P=12, W=32, H=32)
    settings = RenderSettings(width=cam.width, height=cam.height, impl="ref")
    prev = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    try:
        target = jnp.full((cam.height, cam.width, 3), 0.25, jnp.float64)
        cam_in = _render_inputs_f64(cam)

        def loss_fn(colors, opac):
            out = rasterize(
                jnp.asarray(means), jnp.asarray(scales),
                jnp.asarray(q), opac, colors, cam_in, settings,
            )
            return jnp.abs(out["render"] - target).mean()

        c0 = jnp.asarray(colors)
        o0 = jnp.asarray(opac)
        gc, go = jax.grad(loss_fn, argnums=(0, 1))(c0, o0)
        eps = 1e-6
        for idx in [(0, 0), (5, 1), (11, 2)]:
            e = jnp.zeros_like(c0).at[idx].set(eps)
            fd = (loss_fn(c0 + e, o0) - loss_fn(c0 - e, o0)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(gc[idx]), np.asarray(fd),
                                       rtol=1e-3, atol=1e-10)
        for i in [0, 7]:
            e = jnp.zeros_like(o0).at[i].set(eps)
            fd = (loss_fn(c0, o0 + e) - loss_fn(c0, o0 - e)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(go[i]), np.asarray(fd),
                                       rtol=1e-3, atol=1e-10)
    finally:
        jax.config.update("jax_enable_x64", prev)


def test_sh_color_path(rng):
    cam, means, scales, q, opac, colors = make_scene(rng, P=20)
    sh = np.zeros((20, 16, 3), np.float32)
    sh[:, 0] = (colors - 0.5) / 0.28209479177387814
    cols = eval_colors(jnp.asarray(sh), jnp.asarray(means, jnp.float32),
                       jnp.asarray(cam.camera_center, jnp.float32), 3)
    np.testing.assert_allclose(np.asarray(cols), colors, atol=1e-5)
