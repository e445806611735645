"""Pallas blend kernel (interpret mode on CPU) vs the pure-JAX reference."""

import os

os.environ["DQO_PALLAS_INTERPRET"] = "1"

import numpy as np
import jax
import jax.numpy as jnp

from dqo_map_tpu.ops.rasterize import RenderSettings, rasterize
from test_rasterize import make_scene


def _run(impl, cam, means, scales, q, opac, colors, tile_mask=None):
    settings = RenderSettings(width=cam.width, height=cam.height, impl=impl,
                              max_tiles_per_gaussian=16)
    return rasterize(
        jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
        jnp.asarray(q, jnp.float32), jnp.asarray(opac, jnp.float32),
        jnp.asarray(colors, jnp.float32), cam.render_inputs(), settings,
        tile_mask=tile_mask,
        normal_w=jnp.zeros((means.shape[0], 3), jnp.float32),
    )


def test_pallas_forward_matches_ref(rng):
    scene = make_scene(rng, P=80, W=48, H=32)
    out_p = _run("pallas", *scene)
    out_r = _run("ref", *scene)
    np.testing.assert_allclose(np.asarray(out_p["render"]),
                               np.asarray(out_r["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p["T_map"]),
                               np.asarray(out_r["T_map"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p["weight_sum"]),
                               np.asarray(out_r["weight_sum"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p["depth"]),
                               np.asarray(out_r["depth"]), atol=1e-4)
    assert (np.asarray(out_p["depth_index_map"])
            == np.asarray(out_r["depth_index_map"])).all()
    assert (np.asarray(out_p["color_index_map"])
            == np.asarray(out_r["color_index_map"])).all()
    np.testing.assert_allclose(np.asarray(out_p["depth_hit_weight"]),
                               np.asarray(out_r["depth_hit_weight"]), atol=1e-5)
    # per-gaussian touched-pixel counts (to_prune input) must agree exactly
    assert (np.asarray(out_p["n_touched"])
            == np.asarray(out_r["n_touched"])).all()
    assert int(np.asarray(out_r["n_touched"]).sum()) > 0


def test_pallas_forward_with_tile_mask(rng):
    scene = make_scene(rng, P=60, W=48, H=32)
    tm = jnp.asarray(np.array([[1, 0, 1], [0, 1, 0]], np.int32))
    out_p = _run("pallas", *scene, tile_mask=tm)
    out_r = _run("ref", *scene, tile_mask=tm)
    np.testing.assert_allclose(np.asarray(out_p["render"]),
                               np.asarray(out_r["render"]), atol=1e-5)


def test_pallas_gradients_match_ref(rng):
    cam, means, scales, q, opac, colors = make_scene(rng, P=50, W=48, H=32)
    target = jnp.asarray(rng.uniform(0, 1, (cam.height, cam.width, 3)),
                         jnp.float32)
    tdepth = jnp.full((cam.height, cam.width), 2.0, jnp.float32)

    def loss_fn(impl):
        settings = RenderSettings(width=cam.width, height=cam.height,
                                  impl=impl, max_tiles_per_gaussian=16)

        def f(means_, scales_, q_, opac_, colors_):
            out = rasterize(means_, scales_, q_, opac_, colors_,
                            cam.render_inputs(), settings,
                            normal_w=jnp.zeros_like(means_))
            m = out["depth_index_map"] >= 0
            return (
                jnp.abs(out["render"] - target).mean()
                + 0.5 * jnp.where(m, jnp.abs(out["depth"] - tdepth), 0.0).mean()
            )

        return f

    args = (jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
            jnp.asarray(q, jnp.float32), jnp.asarray(opac, jnp.float32),
            jnp.asarray(colors, jnp.float32))
    lp, gp = jax.value_and_grad(loss_fn("pallas"), argnums=(0, 1, 2, 3, 4))(*args)
    lr, gr = jax.value_and_grad(loss_fn("ref"), argnums=(0, 1, 2, 3, 4))(*args)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    names = ["means", "scales", "quats", "opac", "colors"]
    for name, a, b in zip(names, gp, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        scale = np.abs(b).max() + 1e-8
        np.testing.assert_allclose(a / scale, b / scale, atol=2e-4,
                                   err_msg=name)


def test_pallas_normal_map_and_grads_match_ref(rng):
    """The hit-normal channels: values match the ref impl AND the old
    gather-by-index formulation; the cos-loss gradient wrt quaternions
    matches between the Pallas VJP routing and ref autodiff."""
    cam, means, scales, q, opac, colors = make_scene(rng, P=60, W=48, H=32)
    out_p = _run("pallas", cam, means, scales, q, opac, colors)
    out_r = _run("ref", cam, means, scales, q, opac, colors)
    np.testing.assert_allclose(np.asarray(out_p["normal"]),
                               np.asarray(out_r["normal"]), atol=1e-5)

    # old formulation: world min-scale axis gathered by depth_index_map
    from dqo_map_tpu.ops.projection import min_scale_axis
    nw = np.asarray(min_scale_axis(jnp.asarray(scales, jnp.float32),
                                   jnp.asarray(q, jnp.float32)))
    idx = np.asarray(out_r["depth_index_map"])
    expect = np.where((idx >= 0)[..., None], nw[np.clip(idx, 0, None)], 0.0)
    np.testing.assert_allclose(np.asarray(out_r["normal"]), expect, atol=1e-5)
    assert (idx >= 0).any()

    gtn = rng.normal(size=(cam.height, cam.width, 3)).astype(np.float32)
    gtn /= np.linalg.norm(gtn, axis=-1, keepdims=True)
    gtn = jnp.asarray(gtn)

    def loss_fn(impl):
        settings = RenderSettings(width=cam.width, height=cam.height,
                                  impl=impl, max_tiles_per_gaussian=16)

        def f(q_):
            out = rasterize(jnp.asarray(means, jnp.float32),
                            jnp.asarray(scales, jnp.float32), q_,
                            jnp.asarray(opac, jnp.float32),
                            jnp.asarray(colors, jnp.float32),
                            cam.render_inputs(), settings)
            n = out["normal"]
            m = out["depth_index_map"] >= 0
            cos = 1.0 - jnp.sum(n * gtn, -1) / (
                jnp.linalg.norm(n, axis=-1) + 1e-8)
            return jnp.where(m, cos, 0.0).mean()

        return f

    qj = jnp.asarray(q, jnp.float32)
    lp, gp = jax.value_and_grad(loss_fn("pallas"))(qj)
    lr, gr = jax.value_and_grad(loss_fn("ref"))(qj)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-5)
    gp, gr = np.asarray(gp), np.asarray(gr)
    assert np.isfinite(gp).all()
    assert np.abs(gr).max() > 0
    scale = np.abs(gr).max() + 1e-8
    np.testing.assert_allclose(gp / scale, gr / scale, atol=2e-4)


def test_pallas_bg_surface_matches_ref(rng):
    """One-surface background composite: pallas fwd+bwd vs the ref path."""
    scene = make_scene(rng, P=80, W=48, H=32)
    cam, means, scales, q, opac, colors = scene
    H, W = cam.height, cam.width
    bgr = np.random.default_rng(5)
    bg_maps = {
        "S": jnp.asarray(bgr.uniform(0, 1, (H, W, 3)), jnp.float32),
        "D": jnp.asarray(bgr.uniform(1.5, 3.5, (H, W)), jnp.float32),
        "tau": jnp.asarray(bgr.uniform(0.0, 1.0, (H, W)), jnp.float32),
    }

    def run(impl, m, c):
        settings = RenderSettings(width=W, height=H, impl=impl,
                                  max_tiles_per_gaussian=16)
        return rasterize(
            jnp.asarray(m, jnp.float32), jnp.asarray(scales, jnp.float32),
            jnp.asarray(q, jnp.float32), jnp.asarray(opac, jnp.float32),
            jnp.asarray(c, jnp.float32), cam.render_inputs(), settings,
            bg_maps=bg_maps)

    out_p = run("pallas", means, colors)
    out_r = run("ref", means, colors)
    np.testing.assert_allclose(np.asarray(out_p["render"]),
                               np.asarray(out_r["render"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p["T_final"]),
                               np.asarray(out_r["T_final"]), atol=1e-5)

    gt = jnp.zeros((H, W, 3))

    def loss(impl):
        def f(m, c):
            o = run(impl, m, c)
            return jnp.abs(o["render"] - gt).mean()
        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1))(
        jnp.asarray(means, jnp.float32), jnp.asarray(colors, jnp.float32))
    gr = jax.grad(loss("ref"), argnums=(0, 1))(
        jnp.asarray(means, jnp.float32), jnp.asarray(colors, jnp.float32))
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-3)
