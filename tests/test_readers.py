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


def _ours_fixture(root, n=4):
    """ScanNet++ / 'ours' layout (ref readOursSceneInfo,
    dataset_readers.py:1040-1145)."""
    for d in ("color", "depth", "pose", "intrinsic"):
        os.makedirs(root / d, exist_ok=True)
    for i in range(n):
        _write_rgbd(root / "color" / f"{i}.jpg",
                    root / "depth" / f"{i}.png", seed=40 + i,
                    depth_scale=1000.0)
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        np.savetxt(root / "pose" / f"{i}.txt", pose)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 24.0
    K[0, 2], K[1, 2] = 16.0, 12.0
    np.savetxt(root / "intrinsic" / "intrinsic_depth.txt", K)


def test_read_ours(tmp_path):
    from dqo_map_tpu.data.readers import read_ours
    _ours_fixture(tmp_path, n=4)
    cams = read_ours(str(tmp_path))
    assert len(cams) == 4
    assert cams[0].width == 32 and cams[0].height == 24
    assert abs(cams[0].fx - 24.0) < 1e-9
    # first-frame-relative poses
    np.testing.assert_allclose(cams[0].c2w, np.eye(4), atol=1e-12)
    np.testing.assert_allclose(cams[2].c2w[0, 3], 0.10, atol=1e-9)
    assert len(read_ours(str(tmp_path), frame_num=2)) == 2
    # frame_step subsampling
    assert len(read_ours(str(tmp_path), frame_step=1)) == 2


def test_read_replica_semantics(tmp_path):
    """use_semantics loads semantic_colors/*.png into Camera.semantics and
    Camera.instance (ref dataset_readers.py:820-822,934-944)."""
    from dqo_map_tpu.data.readers import read_replica
    os.makedirs(tmp_path / "scene" / "results", exist_ok=True)
    os.makedirs(tmp_path / "scene" / "semantic_colors", exist_ok=True)
    (tmp_path / "cam_params.json").write_text(json.dumps({"camera": {
        "fx": 24.0, "fy": 24.0, "cx": 16.0, "cy": 12.0, "scale": 1000.0,
        "w": 32, "h": 24}}))
    lines = []
    for i in range(3):
        _write_rgbd(tmp_path / "scene" / "results" / f"frame{i:06d}.jpg",
                    tmp_path / "scene" / "results" / f"depth{i:06d}.png",
                    seed=60 + i, depth_scale=1000.0)
        sem = np.zeros((24, 32, 3), np.uint8)
        sem[:, :16] = (255, 0, 0)
        Image.fromarray(sem).save(
            tmp_path / "scene" / "semantic_colors" / f"semantic_color{i:06d}.png")
        lines.append(" ".join(map(str, np.eye(4).reshape(-1))))
    (tmp_path / "scene" / "traj.txt").write_text("\n".join(lines) + "\n")
    cams = read_replica(str(tmp_path / "scene"), use_semantics=True)
    assert len(cams) == 3
    assert cams[0].semantics is not None and cams[0].semantics.shape == (24, 32, 3)
    np.testing.assert_allclose(cams[0].semantics[0, 0], [1.0, 0.0, 0.0])
    assert cams[0].instance is not None


def test_read_colmap_bin_and_txt(tmp_path):
    """COLMAP parsers against hand-written bin+txt fixtures
    (ref scene/colmap_loader.py)."""
    import struct
    from dqo_map_tpu.data.colmap import qvec_to_rotmat
    from dqo_map_tpu.data.readers import read_colmap
    from scipy.spatial.transform import Rotation as Rot

    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    os.makedirs(tmp_path / "images")
    q = Rot.from_euler("y", 15, degrees=True).as_quat()  # xyzw
    qw, qx, qy, qz = q[3], q[0], q[1], q[2]
    t = np.array([0.1, -0.2, 0.5])
    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 32, 24))
        f.write(struct.pack("<4d", 24.0, 25.0, 16.0, 12.0))
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<4d", qw, qx, qy, qz))
        f.write(struct.pack("<3d", *t))
        f.write(struct.pack("<i", 1))
        f.write(b"im0.png\x00")
        f.write(struct.pack("<Q", 0))
    _write_rgbd(tmp_path / "images" / "im0.png",
                tmp_path / "d.png", seed=1)
    cams = read_colmap(str(tmp_path))
    assert len(cams) == 1
    c = cams[0]
    assert abs(c.fx - 24.0) < 1e-9 and abs(c.fy - 25.0) < 1e-9
    w2c = np.linalg.inv(c.c2w)
    np.testing.assert_allclose(w2c[:3, :3],
                               qvec_to_rotmat([qw, qx, qy, qz]), atol=1e-9)
    np.testing.assert_allclose(w2c[:3, 3], t, atol=1e-9)

    # same scene as text
    (sparse / "cameras.bin").unlink()
    (sparse / "images.bin").unlink()
    (sparse / "cameras.txt").write_text(
        "# cams\n1 PINHOLE 32 24 24.0 25.0 16.0 12.0\n")
    (sparse / "images.txt").write_text(
        f"# imgs\n7 {qw} {qx} {qy} {qz} {t[0]} {t[1]} {t[2]} 1 im0.png\n\n")
    cams2 = read_colmap(str(tmp_path))
    np.testing.assert_allclose(cams2[0].c2w, c.c2w, atol=1e-9)


def test_read_blender(tmp_path):
    from dqo_map_tpu.data.readers import read_blender
    os.makedirs(tmp_path / "train")
    frames = []
    for i in range(2):
        rgb = np.random.default_rng(i).integers(
            0, 255, (24, 32, 4), dtype=np.uint8)
        Image.fromarray(rgb).save(tmp_path / "train" / f"r_{i}.png")
        m = np.eye(4)
        m[0, 3] = 0.3 * i
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": m.tolist()})
    (tmp_path / "transforms_train.json").write_text(json.dumps(
        {"camera_angle_x": 0.8, "frames": frames}))
    cams = read_blender(str(tmp_path))
    assert len(cams) == 2
    assert cams[0].image.shape == (24, 32, 3)
    assert abs(cams[1].c2w[0, 3] - 0.3) < 1e-9
    # OpenGL->OpenCV flip applied
    np.testing.assert_allclose(cams[0].c2w[:3, 1], [0, -1, 0], atol=1e-12)
