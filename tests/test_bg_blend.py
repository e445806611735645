"""One-surface background composite vs a true global render.

The compact local optimize renders only the unstable cloud and composites a
frozen stable background INSIDE the blend at its true per-pixel depth
(`rasterize(..., bg_maps=...)`). For a scene whose stable content is a flat
surface at a single depth (every stable entry at z=D) and unstable entries
strictly on either side, the one-surface model is EXACT: colors and
unstable-parameter gradients must match the full global render.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dqo_map_tpu.models import gaussian_map as gm
from dqo_map_tpu.ops.rasterize import RenderSettings
from dqo_map_tpu.slam.renderer import render_state


def _proj(W, H, fx):
    znear, zfar = 0.01, 100.0
    P = np.zeros((4, 4), np.float32)
    P[0, 0] = 2 * fx / W
    P[1, 1] = 2 * fx / H
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def _scene(W=48, H=32, seed=0):
    """Stable = wall of gaussians all at z=3; unstable = cloud at z<2.5
    plus a few at z>3.5 (BEHIND the wall — the all-in-front composite gets
    these wrong, the depth-aware one must not)."""
    rng = np.random.default_rng(seed)
    state = gm.empty_map(512)
    gw = 12
    xs, ys = np.meshgrid(np.linspace(-1.6, 1.6, gw),
                         np.linspace(-1.1, 1.1, gw))
    wall = np.stack([xs.ravel(), ys.ravel(), np.full(gw * gw, 3.0)], -1)
    new = gm.make_new_points(
        jnp.asarray(wall, jnp.float32),
        jnp.zeros((gw * gw, 3), jnp.float32).at[:, 2].set(1.0),
        jnp.asarray(rng.uniform(0.2, 1, (gw * gw, 3)), jnp.float32),
        jnp.ones(gw * gw, bool), jnp.int32(0), jnp.int32(0), 0.95,
        (1.0, 1.0, 0.1))
    new["scaling"] = jnp.full((gw * gw, 3), np.log(0.22), jnp.float32)
    state = gm.add_points(state, new, gm.STABLE)

    n_u = 60
    zu = np.where(rng.random(n_u) < 0.7, rng.uniform(1.0, 2.5, n_u),
                  rng.uniform(3.5, 4.5, n_u))
    xyz = np.stack([rng.uniform(-1, 1, n_u) * zu / 2,
                    rng.uniform(-0.7, 0.7, n_u) * zu / 2, zu], -1)
    new = gm.make_new_points(
        jnp.asarray(xyz, jnp.float32),
        jnp.asarray(rng.normal(size=(n_u, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (n_u, 3)), jnp.float32),
        jnp.ones(n_u, bool), jnp.int32(0), jnp.int32(0), 0.8, (1.0, 1.0, 0.1))
    new["scaling"] = jnp.full((n_u, 3), np.log(0.08), jnp.float32)
    state = gm.add_points(state, new, gm.UNSTABLE)

    fx = 0.75 * W
    cam = {
        "w2c": jnp.eye(4, dtype=jnp.float32),
        "full_proj": jnp.asarray(_proj(W, H, fx), jnp.float32),
        "cam_pos": jnp.zeros(3, jnp.float32),
        "K": jnp.asarray([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]],
                         jnp.float32),
        "tan_fovx": jnp.float32(W / (2 * fx)),
        "tan_fovy": jnp.float32(H / (2 * fx)),
    }
    settings = RenderSettings(width=W, height=H, impl="ref",
                              entry_cap=1 << 14)
    return state, cam, settings


def test_bg_surface_composite_matches_global():
    state, cam, settings = _scene()
    full = render_state(state, cam, settings, "global")
    bg = render_state(state, cam, settings, "stable")
    bgm = {"S": bg["render"],
           "D": jnp.where(bg["depth_index_map"] >= 0, bg["depth"], 1e30),
           "tau": bg["T_final"]}
    u = render_state(state, cam, settings, "unstable", bg_maps=bgm)
    # exact where the stable content has an opaque hit (the one-surface
    # model's depth is the true surface depth there) or no stable content at
    # all; pixels with only SEMI-transparent stable content fall back to the
    # surface-behind-everything approximation and may deviate
    diff = np.abs(np.asarray(u["render"]) - np.asarray(full["render"]))
    exact_px = (np.asarray(bg["depth_index_map"]) >= 0) | (
        np.asarray(bg["T_map"]) > 0.999)
    # exact up to T_THRESHOLD TRUNCATION ORDER: the stable-only render keeps
    # tail entries whose global test_T would dip below T_threshold (its T
    # prefix starts at 1, the global one at T_front) — bounded by the
    # contributions in the [T_threshold, T_threshold/T_front) band, ~1e-3
    assert diff[exact_px].max() < 3e-3, diff[exact_px].max()
    assert diff[exact_px].mean() < 1e-4, diff[exact_px].mean()
    assert diff.mean() < 1e-3, diff.mean()
    # depth-aware hit composite
    hit_u = np.asarray(u["depth_index_map"]) >= 0
    hit_bg = np.asarray(bg["depth_index_map"]) >= 0
    u_wins = hit_u & (~hit_bg | (np.asarray(u["depth"])
                                 <= np.asarray(bg["depth"])))
    depth = np.where(u_wins, np.asarray(u["depth"]), np.asarray(bg["depth"]))
    np.testing.assert_allclose(depth, np.asarray(full["depth"]), atol=2e-3)


def test_bg_surface_gradients_match_global():
    state, cam, settings = _scene()
    gt = jnp.zeros((32, 48, 3), jnp.float32)
    umask = state.status == gm.UNSTABLE

    def loss_global(xyz, sh):
        st = state._replace(xyz=xyz, sh=sh)
        out = render_state(st, cam, settings, "global")
        return jnp.abs(out["render"] - gt).mean()

    def loss_bg(xyz, sh):
        st = state._replace(xyz=xyz, sh=sh)
        bg = render_state(state, cam, settings, "stable")
        bgm = {"S": bg["render"],
               "D": jnp.where(bg["depth_index_map"] >= 0, bg["depth"], 1e30),
               "tau": bg["T_final"]}
        out = render_state(st, cam, settings, "unstable", bg_maps=bgm)
        return jnp.abs(out["render"] - gt).mean()

    g_full = jax.grad(loss_global, argnums=(0, 1))(state.xyz, state.sh)
    g_bg = jax.grad(loss_bg, argnums=(0, 1))(state.xyz, state.sh)
    m = np.asarray(umask)
    for a, b in zip(g_bg, g_full):
        a = np.asarray(a)[m]
        b = np.asarray(b)[m]
        # boundary pixels (semi-transparent stable) contribute small
        # deviations; the bulk of the gradient field must match
        np.testing.assert_allclose(a, b, atol=3e-3)
        assert np.abs(a - b).mean() < 2e-4
