"""Native feature pose backend: known-shift recovery + fusion fallbacks."""

import os
import subprocess

import numpy as np
import pytest

RUNTIME = os.path.join(os.path.dirname(__file__), "..", "runtime")


def _ensure_lib():
    so = os.path.join(RUNTIME, "liborb_backend.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", RUNTIME, "liborb_backend.so"],
                       check=True, capture_output=True)
    return so


class FakeFrame:
    def __init__(self, image, depth, K):
        self.image = image
        self.depth = depth
        self.K = K


def _textured_pair(shift_px=5, W=320, H=240, z=2.0, fx=160.0):
    """Fronto-parallel textured plane; camera translates +x so the image
    shifts left by exactly `shift_px` (t_rel = [tx, 0, 0], R = I)."""
    rng = np.random.default_rng(3)
    big = rng.uniform(0, 1, (H, W + shift_px, 3)).astype(np.float32)
    # blotchy texture (box blur) so corners are stable under BRIEF
    for _ in range(2):
        big = 0.25 * (np.roll(big, 1, 0) + np.roll(big, -1, 0)
                      + np.roll(big, 1, 1) + np.roll(big, -1, 1))
    big = 0.5 * big + 0.5 * (big > big.mean())  # boost contrast
    img0 = big[:, :W]
    img1 = big[:, shift_px:W + shift_px]
    depth = np.full((H, W), z, np.float32)
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
    tx = shift_px * z / fx
    return (FakeFrame(img0, depth, K), FakeFrame(img1, depth, K), tx)


def test_known_translation_recovered():
    _ensure_lib()
    from dqo_map_tpu.slam.pose_backend import PoseBackend

    class Args:
        orb_useicp = True
        orb_max_feats = 800

    f0, f1, tx = _textured_pair()
    be = PoseBackend(Args())
    assert be.ingest(f0) == -1
    n = be.ingest(f1)
    assert n >= be.MIN_INLIERS, f"too few inliers: {n}"
    rel = be.rel
    assert np.allclose(rel[:3, :3], np.eye(3), atol=0.02), rel
    assert abs(rel[0, 3] - tx) < 0.01, (rel[0, 3], tx)
    assert abs(rel[1, 3]) < 0.01 and abs(rel[2, 3]) < 0.02, rel[:3, 3]


def test_fusion_falls_back_to_icp():
    _ensure_lib()
    from dqo_map_tpu.slam.pose_backend import PoseBackend

    class Args:
        orb_useicp = True

    be = PoseBackend(Args())
    # featureless frames -> no inliers -> fall back to the ICP pose
    blank = FakeFrame(np.zeros((120, 160, 3), np.float32),
                      np.full((120, 160), 2.0, np.float32),
                      np.array([[80, 0, 80], [0, 80, 60], [0, 0, 1.0]]))
    be.ingest(blank)
    be.poses.append(np.eye(4))
    icp_rel = np.eye(4)
    icp_rel[0, 3] = 0.05
    pose = be.track(blank, icp_rel, icp_success=True)
    assert np.allclose(pose, icp_rel)
    # ICP also failed -> constant velocity (identity rel)
    pose2 = be.track(blank, icp_rel, icp_success=False)
    assert np.allclose(pose2, pose)


def _shift_frame(big, shift_px, W, H, z, fx):
    img = big[:, shift_px:W + shift_px]
    depth = np.full((H, W), z, np.float32)
    K = np.array([[fx, 0, W / 2], [0, fx, H / 2], [0, 0, 1]], np.float32)
    return FakeFrame(img, depth, K)


def test_keyframe_override_gated_against_teleport():
    """Adversarial: a corrupted keyframe absolute pose (e.g. a wrong loop
    match) must NOT teleport the camera when it disagrees with the composed
    relative estimate (VERDICT r02 weak #8). After a tracking loss the gate
    opens (relocalization)."""
    _ensure_lib()
    from dqo_map_tpu.slam.pose_backend import PoseBackend

    class Args:
        orb_useicp = True
        orb_loop_closing = False

    be = PoseBackend(Args())
    blank = FakeFrame(np.zeros((120, 160, 3), np.float32),
                      np.full((120, 160), 2.0, np.float32),
                      np.array([[80, 0, 80], [0, 80, 60], [0, 0, 1.0]]))
    be.ingest(blank)
    be.poses.append(np.eye(4))
    be.source_last = "features"          # healthy tracking state
    icp_rel = np.eye(4)
    icp_rel[0, 3] = 0.05

    # forge a strong-but-wrong keyframe match: 5 m away from the estimate
    teleport = np.eye(4)
    teleport[0, 3] = 5.0

    real_ingest = be.ingest

    def poisoned_ingest(frame, icp_pose10=None):
        n = real_ingest(frame, icp_pose10)
        be.kf_inliers_last = 50
        be.abs_pose = teleport
        return n

    be.ingest = poisoned_ingest
    pose = be.track(blank, icp_rel, icp_success=True)
    assert np.linalg.norm(pose[:3, 3]) < 1.0, "teleport not rejected"
    assert be.source_last == "icp"

    # same forged match right after a tracking loss -> relocalization wins
    be2 = PoseBackend(Args())
    be2.ingest(blank)
    be2.poses.append(np.eye(4))
    be2.source_last = "hold"
    real2 = be2.ingest

    def poisoned2(frame, icp_pose10=None):
        n = real2(frame, icp_pose10)
        be2.kf_inliers_last = 50
        be2.abs_pose = teleport
        return n

    be2.ingest = poisoned2
    pose2 = be2.track(blank, icp_rel, icp_success=True)
    assert np.allclose(pose2, teleport)
    assert be2.source_last == "keyframe"


def test_loop_closing_end_to_end():
    """Drive the full loop pipeline: native loop detection
    (`ob_detect_loop`: descriptor-set scoring + RANSAC verification) ->
    host pose-graph relaxation -> corrected keyframe anchors. A long pan
    away and back with keyframe anchoring disabled-by-distance must fire a
    loop closure and keep the returned pose bounded (VERDICT r03 item 3)."""
    _ensure_lib()
    from dqo_map_tpu.slam.pose_backend import PoseBackend

    class Args:
        orb_useicp = False
        orb_max_feats = 800
        orb_loop_closing = True

    W, H, z, fx = 320, 240, 2.0, 160.0
    max_shift = 60
    rng = np.random.default_rng(7)
    big = rng.uniform(0, 1, (H, W + max_shift, 3)).astype(np.float32)
    for _ in range(2):
        big = 0.25 * (np.roll(big, 1, 0) + np.roll(big, -1, 0)
                      + np.roll(big, 1, 1) + np.roll(big, -1, 1))
    big = 0.5 * big + 0.5 * (big > big.mean())

    be = PoseBackend(Args())
    be.LOOP_MIN_GAP = 3       # tiny synthetic: loop after a few keyframes
    be.LOOP_MIN_INLIERS = 15
    be.LOOP_EVERY = 1
    shifts = (list(range(0, max_shift + 1, 4))
              + list(range(max_shift, -1, -4)))
    for s in shifts:
        f = _shift_frame(big, s, W, H, z, fx)
        if not be.poses:
            be.ingest(f)
            be.poses.append(np.eye(4))
            be.commit(np.eye(4))
        else:
            be.track(f, None, False)
    assert be.num_keyframes() >= be.LOOP_MIN_GAP + 2
    # revisit must have produced at least one closure and a bounded pose
    assert be.loop_closures >= 1
    end_err = np.linalg.norm(be.poses[-1][:3, 3])
    assert end_err < 0.05, f"end-of-loop error {end_err:.4f} m"


def test_keyframe_anchor_bounds_drift():
    """Out-and-back trajectory: frame-to-frame odometry accumulates error,
    the keyframe store (ref ORB-SLAM2 keyframe map) re-anchors the pose so
    returning to the start recovers ~the identity pose."""
    _ensure_lib()
    from dqo_map_tpu.slam.pose_backend import PoseBackend

    class Args:
        orb_useicp = False
        orb_max_feats = 800

    W, H, z, fx = 320, 240, 2.0, 160.0
    max_shift = 12
    rng = np.random.default_rng(5)
    big = rng.uniform(0, 1, (H, W + max_shift, 3)).astype(np.float32)
    for _ in range(2):
        big = 0.25 * (np.roll(big, 1, 0) + np.roll(big, -1, 0)
                      + np.roll(big, 1, 1) + np.roll(big, -1, 1))
    big = 0.5 * big + 0.5 * (big > big.mean())

    shifts = list(range(0, max_shift + 1, 2)) + list(range(max_shift, -1, -2))
    be = PoseBackend(Args())
    poses = []
    for s in shifts:
        f = _shift_frame(big, s, W, H, z, fx)
        if not be.poses:
            be.ingest(f)
            be.poses.append(np.eye(4))
            be.commit(np.eye(4))
            poses.append(np.eye(4))
        else:
            poses.append(be.track(f, None, False))
    assert be.num_keyframes() >= 1
    # at the end we are back at the start: translation error must be small
    # (pure odometry would accumulate per-step noise over 12 steps)
    end_err = np.linalg.norm(poses[-1][:3, 3])
    assert end_err < 0.02, f"end-of-loop drift {end_err:.4f} m"
    # middle of the sweep: translation ~ max_shift * z / fx
    mid = poses[len(shifts) // 2]
    assert abs(mid[0, 3] - max_shift * z / fx) < 0.03


def test_local_ba_landmarks_and_residual():
    """Map-point tier (ref Optimizer::LocalBundleAdjustment +
    LocalMapping, VERDICT r03 Missing #1): keyframes along a textured
    plane must accumulate SHARED landmarks (covisibility), and the
    alternating local BA must leave a small mean 3D residual even when the
    committed keyframe poses carry noise."""
    _ensure_lib()
    from dqo_map_tpu.slam.pose_backend import PoseBackend

    class Args:
        orb_useicp = False
        orb_max_feats = 800
        orb_loop_closing = False

    W, H, z, fx = 320, 240, 2.0, 160.0
    max_shift = 64
    rng = np.random.default_rng(11)
    big = rng.uniform(0, 1, (H, W + max_shift, 3)).astype(np.float32)
    for _ in range(2):
        big = 0.25 * (np.roll(big, 1, 0) + np.roll(big, -1, 0)
                      + np.roll(big, 1, 1) + np.roll(big, -1, 1))
    big = 0.5 * big + 0.5 * (big > big.mean())

    be = PoseBackend(Args())
    for i, s in enumerate(range(0, max_shift + 1, 16)):
        f = _shift_frame(big, s, W, H, z, fx)
        gt = np.eye(4)
        gt[0, 3] = s * z / fx          # ~0.2 m per step -> every frame a KF
        noisy = gt.copy()
        noisy[0, 3] += rng.normal(0, 0.01)   # 1 cm committed-pose noise
        if not be.poses:
            be.ingest(f)
        else:
            be.ingest(f)
        be.poses.append(noisy)
        be.commit(noisy)
    assert be.num_keyframes() >= 4
    # covisibility: consecutive keyframes see the same surface -> far fewer
    # landmarks than total observations (shared points were re-associated)
    n_mp = be.num_mappoints()
    assert n_mp > 100, f"landmark store empty ({n_mp})"
    res = be.ba_residual()
    assert res < 0.05, f"BA residual too large: {res:.4f} m"
    # explicit extra sweep must not increase the residual (monotone ALS)
    be.local_ba(window=8, sweeps=2)
    assert be.ba_residual() <= res + 1e-6
