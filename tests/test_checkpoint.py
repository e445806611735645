"""Checkpoint / resume: state round-trips exactly; resumed run completes."""

import numpy as np

from dqo_map_tpu.config import default_config
from dqo_map_tpu.data.synthetic import synthetic_sequence
from dqo_map_tpu.slam.system import SLAMSystem
import pytest

pytestmark = pytest.mark.slow


def _cfg(out):
    return default_config(
        type="Synthetic", save_path=str(out), use_object=False,
        use_gt_pose=True, capacity=8192, add_capacity=2048,
        uniform_sample_num=800, gaussian_update_frame=2,
        gaussian_update_iter=4, stable_confidence_thres=6,
        min_depth=0.1, max_depth=8.0, memory_length=3, final_global_iter=2,
    )


def test_checkpoint_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    _, cams = synthetic_sequence(6, width=64, height=48)

    sys1 = SLAMSystem(cfg, cameras=cams)
    for fid in range(3):
        sys1.step(cams[fid], fid)
        sys1.mapping.time += 1
    ckpt = sys1.save_checkpoint(str(tmp_path / "ck"))
    assert ckpt.endswith(".npz")

    sys2 = SLAMSystem(cfg, cameras=cams)
    nxt = sys2.resume(str(tmp_path / "ck"))
    assert nxt == 3

    s1, s2 = sys1.mapping.state, sys2.mapping.state
    for f in s1._fields:
        np.testing.assert_array_equal(np.asarray(getattr(s1, f)),
                                      np.asarray(getattr(s2, f)), err_msg=f)
    assert sys2.mapping.bucket == sys1.mapping.bucket
    assert len(sys2.tracker.pose_es) == 3
    assert len(sys2.mapping.keyframes) == len(sys1.mapping.keyframes)

    # resumed run completes and stays sane
    result = sys2.run(eval_every=0, verbose=False, max_frames=6,
                      start_frame=nxt)
    assert result["psnr"] > 15
    assert np.isfinite(result["depth_l1_cm"])
