"""Error-adaptive frame-to-model depth fusion (tracker.fuse_model_depth).

The r04 post-mortem (PROFILE_r04.md) showed the reference's fixed-threshold
fusion replaces exact pixels with ~1 cm render noise on noiseless depth and
destroys ATE. The adaptive blend must:
  * collapse to the frame depth (OFF behavior) when the sensor is noiseless,
  * reduce depth error below the raw sensor's when the sensor is noisy and
    the model render is smooth — the regime the mechanism exists for
    (ref icp.py:403-431).
"""

import numpy as np
import jax.numpy as jnp

from dqo_map_tpu.slam.tracker import _median3x3, fuse_model_depth


def _scene(h=64, w=96, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    true = 2.0 + 0.2 * np.sin(xx / 23.0) + 0.1 * np.cos(yy / 17.0)
    normal = np.zeros((h, w, 3), np.float32)
    normal[..., 2] = -1.0
    return true.astype(np.float32), normal, rng


def test_median3x3_matches_numpy():
    rng = np.random.default_rng(1)
    x = rng.random((17, 23)).astype(np.float32)
    got = np.asarray(_median3x3(jnp.asarray(x)))
    pad = np.pad(x, 1, mode="edge")
    want = np.empty_like(x)
    for i in range(x.shape[0]):
        for j in range(x.shape[1]):
            want[i, j] = np.median(pad[i:i + 3, j:j + 3])
    np.testing.assert_allclose(got, want, atol=0)


def test_noiseless_frame_passes_through():
    true, normal, rng = _scene()
    render = true + rng.normal(0, 0.007, true.shape).astype(np.float32)
    fused = np.asarray(fuse_model_depth(
        jnp.asarray(render), jnp.asarray(true), jnp.asarray(normal),
        jnp.asarray(normal)))
    # exact sensor -> w ~ 0 -> fused ~ frame, NOT the noisy render
    err_fused = np.abs(fused - true).mean()
    err_render = np.abs(render - true).mean()
    assert err_fused < 0.2 * err_render, (err_fused, err_render)
    assert err_fused < 5e-4


def test_noisy_sensor_fusion_beats_raw_frame():
    true, normal, rng = _scene(seed=2)
    frame = true + rng.normal(0, 0.01, true.shape).astype(np.float32)
    render = true.copy()          # smooth, accurate model depth
    fused = np.asarray(fuse_model_depth(
        jnp.asarray(render), jnp.asarray(frame), jnp.asarray(normal),
        jnp.asarray(normal), 0.05, 0.01))
    err_fused = np.abs(fused - true).mean()
    err_frame = np.abs(frame - true).mean()
    assert err_fused < 0.6 * err_frame, (err_fused, err_frame)


def test_frame_invalid_keeps_render():
    true, normal, _ = _scene(seed=3)
    frame = true.copy()
    frame[10:20, 10:20] = 0.0      # sensor hole
    fused = np.asarray(fuse_model_depth(
        jnp.asarray(true), jnp.asarray(frame), jnp.asarray(normal),
        jnp.asarray(normal)))
    # the hole is filled from the (median-filtered) render depth
    assert np.abs(fused[12:18, 12:18] - true[12:18, 12:18]).max() < 1e-5
