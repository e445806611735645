"""Dual-quadric object layer: algebra, association, batched refinement."""

import numpy as np
import jax.numpy as jnp

from dqo_map_tpu.config import default_config
from dqo_map_tpu.data.synthetic import SyntheticScene, _look_at, synthetic_sequence
from dqo_map_tpu.models.quadrics import (
    Ellipse, Ellipsoid, MapObject, ObjectLayer, _bbox_iou_j, _project_bbox,
    bboxes_iou, detections_filter, refine_objects, OBS_CAP, MAX_OBJECTS,
    OBJ_ITERS,
)


def test_ellipse_roundtrip():
    e = Ellipse([4.0, 2.0], 0.3, [10.0, 5.0])
    e2 = Ellipse.from_dual(e.C_)
    np.testing.assert_allclose(sorted(e2.axes_), sorted(e.axes_), atol=1e-8)
    np.testing.assert_allclose(e2.center_, e.center_, atol=1e-8)


def test_ellipsoid_projection_matches_numeric():
    axes = np.array([0.3, 0.2, 0.25])
    R = np.eye(3)
    center = np.array([0.1, 0.2, 2.0])
    ell = Ellipsoid(axes, R, center)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    Rt = np.eye(4)[:3]
    proj = ell.project(K @ Rt)
    bb = proj.compute_bbox()
    # numeric: project surface points
    th = np.linspace(0, np.pi, 60)
    ph = np.linspace(0, 2 * np.pi, 120)
    T, P = np.meshgrid(th, ph)
    pts = np.stack([
        axes[0] * np.sin(T) * np.cos(P), axes[1] * np.sin(T) * np.sin(P),
        axes[2] * np.cos(T)], -1).reshape(-1, 3) + center
    uv = pts @ K.T
    uv = uv[:, :2] / uv[:, 2:]
    bb_num = [uv[:, 0].min(), uv[:, 1].min(), uv[:, 0].max(), uv[:, 1].max()]
    np.testing.assert_allclose(bb, bb_num, atol=0.5)


def test_project_bbox_jax_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(5):
        axes = rng.uniform(0.1, 0.4, 3)
        ang = rng.uniform(0, 1)
        from scipy.spatial.transform import Rotation
        R = Rotation.from_rotvec(rng.normal(size=3) * 0.4).as_matrix()
        center = np.array([*rng.uniform(-0.5, 0.5, 2), rng.uniform(1.5, 3)])
        K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        Rt = np.eye(4)[:3]
        bb_np = Ellipsoid(axes, R, center).project(K @ Rt).compute_bbox()
        bb_j = np.asarray(_project_bbox(
            jnp.asarray(axes, jnp.float32), jnp.asarray(R, jnp.float32),
            jnp.asarray(center, jnp.float32), jnp.asarray(K @ Rt, jnp.float32)))
        np.testing.assert_allclose(bb_j, bb_np, rtol=1e-3, atol=1e-2)


def test_detections_filter():
    dets = [
        {"cat": 1, "score": 0.9, "bbox": [10, 10, 60, 60],
         "ellipse": [35, 35, 50, 50, 0.0], "color": [255, 0, 0]},
        {"cat": 1, "score": 0.1, "bbox": [10, 10, 60, 60], "ellipse": None},
        {"cat": 1, "score": 0.9, "bbox": [12, 12, 62, 62],
         "ellipse": [37, 37, 50, 50, 0.0]},  # duplicate (same cat, IoU>0.3)
        {"cat": 2, "score": 0.9, "bbox": [5, 5, 6, 6], "ellipse": None},  # tiny
    ]
    depth = np.full((100, 100), 2.0, np.float32)
    kept, dd = detections_filter(dets, depth, 100, 100)
    assert len(kept) == 1
    assert abs(dd[0, 0] - 2.0) < 1e-6


def test_refine_objects_improves_iou():
    """Perturbed ellipsoid should recover towards GT from bbox observations."""
    rng = np.random.default_rng(1)
    gt_axes = np.array([0.3, 0.2, 0.25])
    gt_center = np.array([0.1, -0.1, 2.0])
    gt_R = np.eye(3)
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
    # observations from multiple viewpoints
    obs_bbox = np.zeros((MAX_OBJECTS, OBS_CAP, 4), np.float32)
    obs_P = np.zeros((MAX_OBJECTS, OBS_CAP, 3, 4), np.float32)
    obs_valid = np.zeros((MAX_OBJECTS, OBS_CAP), bool)
    n = 12
    for i in range(n):
        ang = 0.15 * i
        eye = gt_center + np.array([1.5 * np.sin(ang), 0.2, -1.8 * np.cos(ang)])
        c2w = _look_at(eye, gt_center)
        Rt = np.linalg.inv(c2w)[:3]
        bb = Ellipsoid(gt_axes, gt_R, gt_center).project(K @ Rt).compute_bbox()
        obs_bbox[0, i] = bb
        obs_P[0, i] = K @ Rt
        obs_valid[0, i] = True

    axes0 = gt_axes * np.array([1.4, 0.7, 1.2])
    center0 = gt_center + np.array([0.06, -0.05, 0.1])
    axes = np.zeros((MAX_OBJECTS, 3), np.float32)
    axes[0] = axes0
    R = np.tile(np.eye(3, dtype=np.float32), (MAX_OBJECTS, 1, 1))
    center = np.zeros((MAX_OBJECTS, 3), np.float32)
    center[0] = center0
    opt_mask = np.zeros(MAX_OBJECTS, bool)
    opt_mask[0] = True
    iters = 60
    rand_idx = rng.integers(0, n, (iters, MAX_OBJECTS)).astype(np.int32)

    def mean_iou(a, r, c):
        ious = []
        for i in range(n):
            bb = np.asarray(_project_bbox(
                jnp.asarray(a, jnp.float32), jnp.asarray(r, jnp.float32),
                jnp.asarray(c, jnp.float32), jnp.asarray(obs_P[0, i])))
            ious.append(bboxes_iou(obs_bbox[0, i], bb))
        return np.mean(ious)

    iou_before = mean_iou(axes0, np.eye(3), center0)
    na, nR, nc = refine_objects(
        jnp.asarray(axes), jnp.asarray(R), jnp.asarray(center),
        jnp.asarray(obs_bbox), jnp.asarray(obs_P), jnp.asarray(obs_valid),
        jnp.asarray(opt_mask), jnp.asarray(rand_idx), iters=iters)
    iou_after = mean_iou(np.asarray(na)[0], np.asarray(nR)[0], np.asarray(nc)[0])
    assert iou_after > iou_before + 0.05, (iou_before, iou_after)
    # unoptimized slots untouched
    np.testing.assert_allclose(np.asarray(na)[1], axes[1])


def test_object_layer_end_to_end():
    scene, cams = synthetic_sequence(12, width=160, height=120, n_objects=3,
                                     with_detections=True)
    cfg = default_config(use_object=True)
    layer = ObjectLayer(cfg)
    n_with_dets = 0
    for i, c in enumerate(cams):
        if not c.detections:
            continue
        n_with_dets += 1
        fm = {"depth_map": jnp.asarray(c.depth)}
        layer.process_frame(c, fm, i)
        layer.optimize_objects(c, i)
    assert n_with_dets > 0, "synthetic scene produced no detections"
    assert len(layer.objects) >= 1
    # association should not explode the object count
    assert len(layer.objects) <= 3 + 2
    # recovered centers close to GT object centers (match greedily)
    gt_centers = [o["center"] for o in scene.objects]
    for obj in layer.objects:
        d = min(np.linalg.norm(obj.ellipsoid_.center_ - g) for g in gt_centers)
        assert d < 0.5, f"object center off by {d}"
    iou_log = layer.record_iou(cams[0].K.astype(np.float64))
    assert all(0 <= v <= 1 for v in iou_log.values())


def test_association_variants():
    """qd and iou_qd association (ref ablation, quadrics.py:970-988 +
    eval_obj/results_accociation/) keep the object count sane and bind
    detections like the iou default on the synthetic scene."""
    scene, cams = synthetic_sequence(12, width=160, height=120, n_objects=3,
                                     with_detections=True)
    gt_centers = [o["center"] for o in scene.objects]
    counts = {}
    for mode in ("iou", "qd", "iou_qd"):
        cfg = default_config(use_object=True, association=mode)
        layer = ObjectLayer(cfg)
        assert layer.association == mode
        for i, c in enumerate(cams):
            if not c.detections:
                continue
            fm = {"depth_map": jnp.asarray(c.depth)}
            layer.process_frame(c, fm, i)
        assert 1 <= len(layer.objects) <= 3 + 2, mode
        for obj in layer.objects:
            d = min(np.linalg.norm(obj.ellipsoid_.center_ - g)
                    for g in gt_centers)
            assert d < 0.5, (mode, d)
        counts[mode] = len(layer.objects)
    assert set(counts) == {"iou", "qd", "iou_qd"}


def test_refine_objects_render_mode0():
    """MODE=0: the render-based object refinement (one gaussian per
    ellipsoid, L1 against the object-color image) must pull a perturbed
    center back toward the GT configuration (ref mapper.py:223-226,
    gaussian_pointcloud.py:380-413)."""
    import jax.numpy as jnp
    import numpy as np
    from dqo_map_tpu.models.cameras import Camera
    from dqo_map_tpu.models.quadrics import MAX_OBJECTS, refine_objects_render
    from dqo_map_tpu.ops.rasterize import RenderSettings, rasterize
    from dqo_map_tpu.utils.math3d import normalize

    W, H = 64, 48
    cam_obj = Camera(uid=0, c2w=np.eye(4), fx=50.0, fy=50.0, cx=W / 2,
                     cy=H / 2, width=W, height=H)
    cam = cam_obj.render_inputs()
    settings = RenderSettings(width=W, height=H, impl="ref",
                              max_tiles_per_gaussian=16)

    O = MAX_OBJECTS
    log_axes = np.full((O, 3), np.log(1e-4), np.float32)
    quat = np.tile(np.array([1, 0, 0, 0], np.float32), (O, 1))
    center = np.zeros((O, 3), np.float32)
    colors = np.zeros((O, 3), np.float32)
    opt_mask = np.zeros((O,), bool)
    # one GT object in front of the camera
    gt_center = np.array([0.1, 0.0, 2.0], np.float32)
    log_axes[0] = np.log([0.4, 0.3, 0.2])
    center[0] = gt_center
    colors[0] = [0.9, 0.2, 0.1]
    opt_mask[0] = True

    gt_img = rasterize(
        jnp.asarray(center), jnp.exp(jnp.asarray(log_axes)),
        normalize(jnp.asarray(quat)), jnp.where(jnp.asarray(opt_mask), 0.99, 0.0),
        jnp.asarray(colors), cam, settings, valid_mask=jnp.asarray(opt_mask),
        with_normal=False, with_n_touched=False)["render"]

    # perturb the center and refine against the GT image
    center_p = center.copy()
    center_p[0] += [0.15, -0.1, 0.0]
    err0 = np.linalg.norm(center_p[0] - gt_center)
    new_la, new_q, new_c = refine_objects_render(
        jnp.asarray(log_axes), jnp.asarray(quat), jnp.asarray(center_p),
        jnp.asarray(colors), jnp.asarray(opt_mask), cam,
        gt_img, settings, iters=80, object_weight=1.0, lr_center=0.03)
    err1 = float(np.linalg.norm(np.asarray(new_c)[0] - gt_center))
    assert err1 < 0.5 * err0, (err0, err1)
    # untouched slots must not move
    assert np.allclose(np.asarray(new_c)[1:], center[1:])
