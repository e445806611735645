"""End-to-end SLAM on a tiny synthetic scene: mapping quality + lifecycle."""

import numpy as np
import pytest

from dqo_map_tpu.config import default_config
from dqo_map_tpu.data.synthetic import synthetic_sequence
from dqo_map_tpu.slam.system import SLAMSystem

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def slam_result(tmp_path_factory):
    out = tmp_path_factory.mktemp("slam")
    cfg = default_config(
        type="Synthetic", save_path=str(out), use_object=False,
        use_gt_pose=True, capacity=8192, add_capacity=2048,
        uniform_sample_num=1200, gaussian_update_frame=2,
        gaussian_update_iter=8, stable_confidence_thres=6,
        min_depth=0.1, max_depth=8.0, memory_length=3, final_global_iter=4,
    )
    _, cams = synthetic_sequence(5, width=64, height=48)
    system = SLAMSystem(cfg, cameras=cams)
    result = system.run(eval_every=0, verbose=False, max_frames=5)
    return system, result, out


def test_mapping_quality(slam_result):
    system, result, _ = slam_result
    assert result["psnr"] > 18, result
    assert result["depth_l1_cm"] < 5.0, result
    assert result["ate_cm"] is not None and result["ate_cm"] < 1e-6  # gt poses


def test_map_lifecycle(slam_result):
    system, _, _ = slam_result
    state = system.mapping.state
    assert int(state.num_stable()) > 200        # promotion happened
    assert int(state.count) <= state.capacity
    # all alive gaussians have sane scales
    import jax.numpy as jnp
    alive = np.asarray(state.alive())
    scales = np.asarray(state.get_scaling())[alive]
    assert np.isfinite(scales).all()
    assert scales.max() < 1.0


def test_outputs_written(slam_result):
    import os
    system, _, out = slam_result
    files = []
    for root, _, fs in os.walk(out):
        files += fs
    assert any(f.endswith(".ply") for f in files)
    assert "pose_es.npy" in files
    assert "performance.json" in files
    assert any("color_compare" in f for f in files)


def test_ply_roundtrip(slam_result):
    import os
    from dqo_map_tpu.utils.ply import load_map_ply, read_gaussian_ply
    system, _, out = slam_result
    ply = None
    for root, _, fs in os.walk(out):
        for f in fs:
            if f.endswith("_merge.ply"):
                ply = os.path.join(root, f)
    assert ply is not None
    d = read_gaussian_ply(ply)
    n = d["xyz"].shape[0]
    assert n > 200
    state2 = load_map_ply(ply, capacity=8192)
    np.testing.assert_allclose(np.asarray(state2.xyz)[:n], d["xyz"], atol=1e-6)
