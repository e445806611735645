"""Pose-graph relaxation (slam/pose_graph.py): SE(3) algebra + loop closing.

Host-side numpy equivalent of the reference's g2o essential-graph solve
(`thirdParty/ORB-SLAM2-PYBIND/src/Optimizer.cc:OptimizeEssentialGraph`)."""

import numpy as np

from dqo_map_tpu.slam.pose_graph import (chain_edges, close_loop, exp_se3,
                                         log_se3, optimize_pose_graph)


def _rand_xi(rng, rot=0.3, trans=0.5):
    return np.concatenate([rng.uniform(-rot, rot, 3),
                           rng.uniform(-trans, trans, 3)])


def test_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        xi = _rand_xi(rng, rot=1.2, trans=2.0)
        np.testing.assert_allclose(log_se3(exp_se3(xi)), xi, atol=1e-9)
    # small-angle branch
    xi = np.array([1e-12, 0, 0, 0.3, -0.2, 0.1])
    np.testing.assert_allclose(log_se3(exp_se3(xi)), xi, atol=1e-9)


def test_consistent_graph_is_fixed_point():
    """Edges measured from the poses themselves -> zero residual, poses
    unchanged."""
    rng = np.random.default_rng(1)
    poses = np.stack([exp_se3(_rand_xi(rng)) for _ in range(6)])
    edges = chain_edges(poses)
    out = optimize_pose_graph(poses, edges, iters=4)
    np.testing.assert_allclose(out, poses, atol=1e-8)


def test_loop_closure_redistributes_drift():
    """Square trajectory traversed with per-step drift; the loop edge back
    to the start pulls the endpoint home and spreads the error along the
    chain (the g2o EssentialGraph behavior)."""
    rng = np.random.default_rng(2)
    # ground-truth square: 4 sides x 3 steps of 1m each, 90 deg turns
    steps = []
    for _ in range(4):
        steps += [np.array([0, 0, 0, 1.0, 0, 0])] * 3
        steps += [np.array([0, np.pi / 2, 0, 0, 0, 0])]
    gt = [np.eye(4)]
    for s in steps:
        gt.append(gt[-1] @ exp_se3(s))
    gt = np.stack(gt)
    # drifted odometry: each measured step gets a small consistent bias
    noise = np.array([0.0, 0.01, 0.0, 0.02, 0.0, 0.0])
    drifted = [np.eye(4)]
    for s in steps:
        drifted.append(drifted[-1] @ exp_se3(s + noise))
    drifted = np.stack(drifted)
    N = drifted.shape[0]
    end_err_before = np.linalg.norm(drifted[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_before > 0.2    # the drift is real

    # loop constraint: last node re-observes node 0 with the TRUE relative
    # pose (the detector measures it fresh, without accumulated drift)
    rel_true = np.linalg.solve(gt[0], gt[-1])     # T_{0}^{-1} T_{N-1}
    # close_loop edge convention: rel = T_m^{-1} T_q with m=0, q=N-1
    new_poses, delta = close_loop(drifted, q_idx=N - 1, m_idx=0,
                                  rel=rel_true)
    end_err_after = np.linalg.norm(new_poses[-1][:3, 3] - gt[-1][:3, 3])
    assert end_err_after < 0.05 * end_err_before, (end_err_before,
                                                   end_err_after)
    # the whole chain improves, not just the endpoint
    mean_before = np.mean(np.linalg.norm(
        drifted[:, :3, 3] - gt[:, :3, 3], axis=1))
    mean_after = np.mean(np.linalg.norm(
        new_poses[:, :3, 3] - gt[:, :3, 3], axis=1))
    assert mean_after < 0.5 * mean_before
    # delta moves the endpoint by (new - old)
    np.testing.assert_allclose(delta @ drifted[-1], new_poses[-1], atol=1e-8)


def test_gauge_fixed_first_node():
    rng = np.random.default_rng(3)
    poses = np.stack([exp_se3(_rand_xi(rng)) for _ in range(5)])
    edges = chain_edges(poses)
    edges.append((0, 4, exp_se3(_rand_xi(rng, 0.05, 0.05))
                  @ np.linalg.solve(poses[0], poses[4]), 10.0))
    out = optimize_pose_graph(poses, edges, iters=6)
    np.testing.assert_allclose(out[0], poses[0], atol=1e-12)
