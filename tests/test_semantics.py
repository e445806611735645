"""Semantic/instance supervision through the full mapping loop.

The reference trains per-gaussian semantic colors with an extra rasterizer
pass L1-matched to the semantic image (mapper.py:878-882, render.py:227-246)
and an instance/transparency term (mapper.py:885-904, Method==0 branch).
Here: frames carry a two-tone semantic image; after a few mapping steps the
trained `sem_rgb` must reproduce it through the semantic render pass.
"""

import jax.numpy as jnp
import numpy as np

from dqo_map_tpu.config import default_config
from dqo_map_tpu.data.synthetic import synthetic_sequence
from dqo_map_tpu.slam.system import SLAMSystem
import pytest

pytestmark = pytest.mark.slow


def _attach_semantics(cams):
    for c in cams:
        sem = np.zeros((c.height, c.width, 3), np.float32)
        sem[:, : c.width // 2] = (1.0, 0.0, 0.0)   # left red
        sem[:, c.width // 2:] = (0.0, 1.0, 0.0)    # right green
        c.semantics = sem
        c.instance = sem


def test_semantic_loss_trains_sem_rgb(tmp_path):
    cfg = default_config(
        type="Synthetic", save_path=str(tmp_path), use_object=False,
        use_gt_pose=True, capacity=8192, add_capacity=2048,
        uniform_sample_num=1200, gaussian_update_frame=2,
        gaussian_update_iter=10, stable_confidence_thres=6,
        min_depth=0.1, max_depth=8.0, memory_length=3,
        use_semantics=True, use_instance=True,
        semantic_color_weight=0.5, semantic_lr=0.05,
    )
    _, cams = synthetic_sequence(4, width=64, height=48)
    _attach_semantics(cams)
    system = SLAMSystem(cfg, cameras=cams)
    for i in range(4):
        system.step(cams[i], i)
        system.mapping.time += 1

    m = system.mapping
    # semantic loss was reported (nonzero path taken)
    assert "semantic_loss" in m.last_reports
    # render the semantic pass and compare against the GT semantic image
    from dqo_map_tpu.slam.renderer import render_state
    out = render_state(m.state, cams[3].render_inputs(), m.settings,
                       "global", colors_precomp=m.state.sem_rgb,
                       bucket=m.bucket)
    sem = np.asarray(out["render"])
    gt = cams[3].semantics
    covered = np.asarray(out["depth_index_map"]) >= 0
    err = np.abs(sem - gt).mean(axis=-1)
    assert covered.mean() > 0.5
    assert err[covered].mean() < 0.25, err[covered].mean()
    # gaussians on the left learned red-ish, right green-ish
    alive = np.asarray(m.state.alive())
    sem_rgb = np.asarray(m.state.sem_rgb)[alive]
    assert np.isfinite(sem_rgb).all()


def test_densify_samples_semantic_colors():
    """New gaussians inherit the semantic pixel color at their source pixel
    (ref gaussian_pointcloud add path carries `_semantics`)."""
    cfg = default_config(
        type="Synthetic", save_path="/tmp/sem_densify", use_object=False,
        use_gt_pose=True, capacity=4096, add_capacity=1024,
        uniform_sample_num=600, min_depth=0.1, max_depth=8.0,
        use_semantics=True,
    )
    _, cams = synthetic_sequence(2, width=64, height=48)
    _attach_semantics(cams)
    system = SLAMSystem(cfg, cameras=cams)
    system.step(cams[0], 0)
    st = system.mapping.state
    alive = np.asarray(st.alive())
    sem = np.asarray(st.sem_rgb)[alive]
    # every added gaussian carries one of the two tones
    red = (sem[:, 0] > 0.9) & (sem[:, 1] < 0.1)
    green = (sem[:, 1] > 0.9) & (sem[:, 0] < 0.1)
    assert (red | green).mean() > 0.95
