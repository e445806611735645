"""Standalone TUM associate / eval_ate CLI tools (offline trajectory eval,
the reference's `scripts/associate.py` + `scripts/eval_ate.py` role)."""

import numpy as np

from dqo_map_tpu.cli.associate import associate, read_stamped_file
from dqo_map_tpu.cli.eval_ate import ate_statistics, main as eval_ate_main


def _write_traj(path, stamps, xyz, jitter=0.0, rng=None):
    with open(path, "w") as f:
        f.write("# stamp tx ty tz qx qy qz qw\n")
        for s, p in zip(stamps, xyz):
            q = p + (rng.normal(0, jitter, 3) if jitter else 0)
            f.write(f"{s:.6f} {q[0]:.6f} {q[1]:.6f} {q[2]:.6f} 0 0 0 1\n")


def test_associate_greedy_closest(tmp_path):
    a = {0.00: ["a0"], 1.00: ["a1"], 2.00: ["a2"]}
    b = {0.011: ["b0"], 1.019: ["b1"], 5.0: ["b5"]}
    pairs = associate(a, b, 0.0, 0.02)
    assert pairs == [(0.00, 0.011), (1.00, 1.019)]
    # each stamp used once: two a-stamps near one b-stamp -> closest wins
    a2 = {0.0: ["x"], 0.01: ["y"]}
    b2 = {0.008: ["z"]}
    assert associate(a2, b2, 0.0, 0.02) == [(0.01, 0.008)]


def test_eval_ate_recovers_rigid_transform(tmp_path):
    rng = np.random.default_rng(0)
    n = 60
    stamps = np.arange(n) * 0.1
    t = np.linspace(0, 4 * np.pi, n)
    gt = np.stack([np.cos(t), np.sin(t), 0.1 * t], axis=1)
    # estimated = rigidly transformed gt + small noise
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    es = gt @ R.T + np.array([3.0, -2.0, 1.0])
    gt_f = tmp_path / "gt.txt"
    es_f = tmp_path / "es.txt"
    _write_traj(gt_f, stamps, gt)
    _write_traj(es_f, stamps + 0.004, es, jitter=0.002, rng=rng)

    stats = eval_ate_main([str(gt_f), str(es_f), "--verbose",
                           "--max_difference", "0.02"])
    assert stats["pairs"] == n
    # rigid offset is aligned away; only the 2 mm noise remains
    assert stats["rmse"] < 0.01


def test_eval_ate_statistics_direct():
    gt = np.random.default_rng(1).normal(size=(40, 3))
    stats, aligned = ate_statistics(gt, gt + 0.001)
    assert stats["rmse"] < 2e-3
    assert aligned.shape == (40, 3)


def test_read_stamped_file_comments(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("# header\n1.0 1 2 3\n\n2.0 4 5 6  # inline\n")
    d = read_stamped_file(str(p))
    assert d[1.0] == ["1", "2", "3"]
    assert d[2.0] == ["4", "5", "6"]
