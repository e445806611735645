"""Object-gaussian binding + instance/semantic render passes."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from dqo_map_tpu.config import default_config
from dqo_map_tpu.data.synthetic import synthetic_sequence
from dqo_map_tpu.slam.system import SLAMSystem


@pytest.fixture(scope="module")
def obj_slam(tmp_path_factory):
    out = tmp_path_factory.mktemp("obj_slam")
    cfg = default_config(
        type="Synthetic", save_path=str(out), use_object=True,
        use_gt_pose=True, capacity=8192, add_capacity=2048,
        uniform_sample_num=1200, gaussian_update_frame=2,
        gaussian_update_iter=6, stable_confidence_thres=6,
        min_depth=0.1, max_depth=8.0, memory_length=3, final_global_iter=2,
    )
    _, cams = synthetic_sequence(5, width=64, height=48, with_detections=True)
    system = SLAMSystem(cfg, cameras=cams)
    result = system.run(eval_every=0, verbose=False, max_frames=5)
    return system, result, out


def test_gaussians_bound_to_objects(obj_slam):
    system, result, _ = obj_slam
    assert result.get("n_objects", 0) >= 1
    state = system.mapping.state
    alive = np.asarray(state.alive())
    oid = np.asarray(state.obj_id)[alive]
    assert (oid >= 0).sum() > 10, "no gaussians bound to objects"


def test_instance_semantic_images_written(obj_slam):
    import os
    _, _, out = obj_slam
    d = os.path.join(out, "eval_render")
    assert os.path.exists(os.path.join(d, "instance.png"))
    assert os.path.exists(os.path.join(d, "semantic.png"))
    from PIL import Image
    inst = np.asarray(Image.open(os.path.join(d, "instance.png")))
    assert inst.ndim == 3 and inst.shape[2] == 3
    # at least some non-background (colored) pixels from bound gaussians
    assert (inst.max(axis=-1) > 30).sum() > 20


def test_palette_deterministic():
    import jax.numpy as jnp

    from dqo_map_tpu.slam.renderer import palette_color
    ids = jnp.asarray([-1, 0, 1, 2, 0])
    c = np.asarray(palette_color(ids))
    assert np.allclose(c[0], 0.0)            # background is black
    assert np.allclose(c[1], c[4])           # same id -> same color
    assert not np.allclose(c[1], c[2])       # different ids differ
    assert (c[1:] >= 0).all() and (c <= 1).all()
