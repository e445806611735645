"""Dataset readers over tiny on-disk fixtures (TUM & RO-MAP layouts)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from dqo_map_tpu.data.readers import Dataset, read_romap, read_tum


def _write_rgbd(rgb_path, depth_path, seed, W=32, H=24, depth_scale=5000.0):
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
    Image.fromarray(rgb).save(rgb_path)
    depth_m = rng.uniform(0.5, 3.0, (H, W)).astype(np.float64)
    d16 = (depth_m * depth_scale).astype(np.uint16)
    Image.fromarray(d16).save(depth_path)
    return rgb, d16.astype(np.float32) / depth_scale


def _tum_fixture(root, n=3):
    os.makedirs(root / "rgb", exist_ok=True)
    os.makedirs(root / "depth", exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], [], []
    truth = []
    for i in range(n):
        t = 100.0 + i * 0.05
        rgb, depth = _write_rgbd(root / "rgb" / f"{t:.4f}.png",
                                 root / "depth" / f"{t:.4f}.png", seed=i)
        truth.append((rgb, depth))
        rgb_lines.append(f"{t:.4f} rgb/{t:.4f}.png")
        # depth timestamp slightly offset, inside the association window
        depth_lines.append(f"{t + 0.004:.4f} depth/{t:.4f}.png")
        gt_lines.append(f"{t:.4f} {0.1 * i} 0 0 0 0 0 1")
    (root / "rgb.txt").write_text("# rgb\n" + "\n".join(rgb_lines) + "\n")
    (root / "depth.txt").write_text("# d\n" + "\n".join(depth_lines) + "\n")
    (root / "groundtruth.txt").write_text("# gt\n" + "\n".join(gt_lines) + "\n")
    (root / "intrinsics.json").write_text(json.dumps(
        {"fx": 24.0, "fy": 24.0, "cx": 16.0, "cy": 12.0}))
    return truth


def test_read_tum(tmp_path):
    truth = _tum_fixture(tmp_path, n=3)
    cams = read_tum(str(tmp_path))
    assert len(cams) == 3
    c0 = cams[0]
    assert (c0.width, c0.height) == (32, 24)
    assert c0.fx == 24.0
    np.testing.assert_allclose(np.asarray(c0.depth), truth[0][1], atol=1e-4)
    np.testing.assert_allclose(np.asarray(c0.image),
                               truth[0][0] / 255.0, atol=1 / 255)
    # poses are first-frame-relative (ref readCameras first-frame-relative,
    # dataset_readers.py:908-916): frame 0 at identity, frame 1 offset +0.1 x
    np.testing.assert_allclose(cams[0].c2w, np.eye(4), atol=1e-12)
    np.testing.assert_allclose(cams[1].c2w[:3, 3], [0.1, 0, 0], atol=1e-12)
    # frame_num selection
    assert len(read_tum(str(tmp_path), frame_num=2)) == 2


def test_read_romap(tmp_path):
    os.makedirs(tmp_path / "rgb")
    os.makedirs(tmp_path / "depth")
    n = 3
    for i in range(n):
        _write_rgbd(tmp_path / "rgb" / f"{i:04d}.png",
                    tmp_path / "depth" / f"{i:04d}.png", seed=10 + i,
                    depth_scale=1000.0)
    gt = "\n".join(f"{i} 0 {0.05 * i} 0 0 0 0 1" for i in range(n))
    (tmp_path / "groundtruth.txt").write_text(gt + "\n")
    (tmp_path / "camera.json").write_text(json.dumps(
        {"fx": 24.0, "fy": 24.0, "cx": 16.0, "cy": 12.0,
         "w": 32, "h": 24, "scale": 1000.0}))
    cams = read_romap(str(tmp_path))
    assert len(cams) == 3
    assert cams[0].width == 32
    np.testing.assert_allclose(cams[2].c2w[:3, 3], [0, 0.1, 0], atol=1e-12)


def test_dataset_dispatch_unknown():
    class P:
        type = "Nope"
    with pytest.raises(ValueError):
        Dataset(P())
