"""KNN, error accumulation, TSDF, 3D-box IoU, PLY."""

import numpy as np
import jax
import jax.numpy as jnp

from dqo_map_tpu.ops.error_accum import accumulate_gaussian_error
from dqo_map_tpu.ops.knn import knn, update_geometry_scales


def test_knn_matches_bruteforce(rng):
    q = rng.normal(size=(37, 3)).astype(np.float32)
    c = rng.normal(size=(211, 3)).astype(np.float32)
    valid = rng.uniform(size=211) > 0.2
    d, i = knn(jnp.asarray(q), jnp.asarray(c), jnp.asarray(valid), k=3,
               row_chunk=16, col_chunk=64, exact=True)
    d, i = np.asarray(d), np.asarray(i)
    d2 = ((q[:, None] - c[None]) ** 2).sum(-1)
    d2[:, ~valid] = np.inf
    ref_i = np.argsort(d2, axis=1)[:, :3]
    ref_d = np.take_along_axis(d2, ref_i, axis=1)
    np.testing.assert_allclose(d, ref_d, rtol=1e-3, atol=1e-4)
    # indices may differ on ties; distances define correctness
    got_d = np.take_along_axis(d2, i, axis=1)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-3, atol=1e-4)


def test_knn_approx_recall(rng):
    """The default approx mode (TPU approx_min_k) must find near-nearest
    neighbors: mean 3-NN distance within 5% of exact (the reference's
    simple-knn is itself Morton-box approximate)."""
    q = rng.normal(size=(256, 3)).astype(np.float32)
    c = rng.normal(size=(2048, 3)).astype(np.float32)
    valid = np.ones(2048, bool)
    d_a, _ = knn(jnp.asarray(q), jnp.asarray(c), jnp.asarray(valid), k=3,
                 row_chunk=64, col_chunk=512)
    d_e, _ = knn(jnp.asarray(q), jnp.asarray(c), jnp.asarray(valid), k=3,
                 row_chunk=64, col_chunk=512, exact=True)
    ratio = np.sqrt(np.asarray(d_a).mean()) / np.sqrt(np.asarray(d_e).mean())
    assert ratio < 1.05


def test_error_accumulation(rng):
    H, W, P = 8, 8, 10
    ce = rng.uniform(size=(H, W)).astype(np.float32)
    de = rng.uniform(size=(H, W)).astype(np.float32)
    ne = np.zeros((H, W), np.float32)
    ci = rng.integers(-1, P, (H, W))
    di = rng.integers(-1, P, (H, W))
    gc, gd, gn, rc = accumulate_gaussian_error(
        P, jnp.asarray(ce), jnp.asarray(de), jnp.asarray(ne),
        jnp.asarray(ci), jnp.asarray(di), 0.5, 0.5, 0.5, True)
    gc = np.asarray(gc)
    for p in range(P):
        m = ci == p
        expect = ce[m].max() if m.any() else 0.0
        assert abs(gc[p] - expect) < 1e-6


def test_tsdf_fusion_flat_plane():
    from dqo_map_tpu.models.cameras import Camera
    from dqo_map_tpu.ops.tsdf import (extract_surface_points, integrate,
                                      make_volume)
    W, H = 32, 24
    cam = Camera(uid=0, c2w=np.eye(4), fx=24.0, fy=24.0, cx=W / 2, cy=H / 2,
                 width=W, height=H)
    depth = jnp.full((H, W), 1.0, jnp.float32)
    color = jnp.full((H, W, 3), 0.5, jnp.float32)
    vol = make_volume([-1.0, -1.0, 0.0], (40, 40, 40), 0.05)
    for _ in range(3):
        vol = integrate(vol, depth, color, jnp.asarray(cam.w2c),
                        jnp.asarray(cam.K))
    pts, cols, valid = extract_surface_points(vol)
    pts = np.asarray(pts)[np.asarray(valid)]
    assert len(pts) > 20
    # surface should sit near z=1
    assert abs(np.median(pts[:, 2]) - 1.0) < 0.08


def test_box3d_iou():
    from dqo_map_tpu.eval.obj_eval import Box3D, box_iou, evaluate_boxes
    a = Box3D(1, [0, 0, 0], [0, 0, 0, 1], [0.5, 0.5, 0.5])
    b = Box3D(1, [0, 0, 0], [0, 0, 0, 1], [0.5, 0.5, 0.5])
    assert abs(box_iou(a, b) - 1.0) < 1e-3
    c = Box3D(1, [0.5, 0, 0], [0, 0, 0, 1], [0.5, 0.5, 0.5])
    assert abs(box_iou(a, c) - 1.0 / 3.0) < 1e-2
    d = Box3D(1, [5, 0, 0], [0, 0, 0, 1], [0.5, 0.5, 0.5])
    assert box_iou(a, d) == 0.0
    # 45-degree rotated identical box
    from scipy.spatial.transform import Rotation
    q = Rotation.from_euler("z", 45, degrees=True).as_quat()
    e = Box3D(1, [0, 0, 0], q, [0.5, 0.5, 0.5])
    iou = box_iou(a, e)
    assert 0.6 < iou < 0.8
    res = evaluate_boxes([a, c], [b])
    assert res["accuracy@0.5"] == 1.0
    assert res["n_pred"] == 2


def test_update_geometry_scales(rng):
    # sparse new points far from each other get clipped max radius
    new = rng.uniform(-1, 1, (16, 3)).astype(np.float32) * 5
    cand = np.concatenate([new, rng.uniform(10, 11, (8, 3)).astype(np.float32)])
    rad = np.concatenate([np.full(16, 1e-6), np.full(8, 0.01)]).astype(np.float32)
    ls, keep = update_geometry_scales(
        jnp.asarray(new), jnp.ones(16, bool), jnp.asarray(cand),
        jnp.asarray(rad), jnp.ones(24, bool), 1.0, (1.0, 1.0, 0.1),
        0.001, 0.05)
    ls = np.asarray(ls)
    assert np.asarray(keep).all()
    np.testing.assert_allclose(np.exp(ls[:, 0]), 0.05, atol=1e-6)  # clipped
    np.testing.assert_allclose(np.exp(ls[:, 2]), 0.005, atol=1e-6)  # z factor


def test_ap_curve():
    from dqo_map_tpu.eval.obj_eval import Box3D, compute_ap_curve
    gt = [Box3D(1, [0, 0, 0], [0, 0, 0, 1], [0.5, 0.5, 0.5]),
          Box3D(2, [2, 0, 0], [0, 0, 0, 1], [0.5, 0.5, 0.5])]
    # one perfect, one off-center (moderate IoU), one false positive
    pred = [Box3D(1, [0, 0, 0], [0, 0, 0, 1], [0.5, 0.5, 0.5]),
            Box3D(2, [2.4, 0, 0], [0, 0, 0, 1], [0.5, 0.5, 0.5]),
            Box3D(3, [9, 9, 9], [0, 0, 0, 1], [0.5, 0.5, 0.5])]
    c = compute_ap_curve(pred, gt)
    assert len(c["ap"]) == len(c["thresholds"]) == 10
    # monotone non-increasing in threshold, 1.0 at the loosest only if both
    # matched, exactly 0.5 at the strictest (only the perfect box survives)
    assert all(a >= b - 1e-9 for a, b in zip(c["ap"], c["ap"][1:]))
    assert c["ap"][0] == 1.0
    assert c["ap"][-1] == 0.5
    assert 0.5 <= c["mean_ap"] <= 1.0
    # score-ranked variant: PR-AUC form, same perfect-match endpoint
    cs = compute_ap_curve(pred, gt, scores=[0.9, 0.8, 0.99])
    assert 0.0 < cs["mean_ap"] <= 1.0
