"""Attribution of the normal-loss cost inside the optimize iteration.

Measured as 10-iter scans on device data, office0 scale. Ablations:
  base           color+depth loss grad (reference point)
  +normal        current per-pixel gather normal loss
  +normal-sg     normal loss with stop_gradient(normal) — fwd cost only
  +normal-lin    linearity trick: S_g scatter in fwd (stop-grad), loss = C - <n, S>/M
  scatter-only   the raw (H*W,3)->(P,3) scatter-add cost
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
import jax.numpy as jnp
import numpy as np

ITERS = 10


def timeit(fn, *args, n=3, warmup=1):
    force = lambda o: np.asarray(jax.tree.leaves(o)[0].ravel()[0])
    for _ in range(warmup):
        out = fn(*args)
    force(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
        force(out)
    return (time.perf_counter() - t0) / n * 1000 / ITERS


P = int(os.environ.get("PROF_P", 262144))
W, H = 1200, 680
rng = np.random.default_rng(0)

from dqo_map_tpu.models import gaussian_map as gm
from dqo_map_tpu.models.cameras import Camera
from dqo_map_tpu.ops.rasterize import RenderSettings
from dqo_map_tpu.slam.mapper import get_params, set_params, masked_mean
from dqo_map_tpu.slam.renderer import compute_binning_state, render_state

state = gm.empty_map(P)
xyz = np.stack([rng.uniform(-2, 2, P), rng.uniform(-1.4, 1.4, P),
                rng.uniform(0.8, 6.0, P)], -1).astype(np.float32)
scal = np.log(np.exp(rng.uniform(np.log(0.005), np.log(0.04), (P, 3)))
              * np.array([1, 1, 0.1])).astype(np.float32)
q = rng.normal(size=(P, 4)).astype(np.float32)
q /= np.linalg.norm(q, axis=1, keepdims=True)
sh = np.zeros((P, 1, 3), np.float32)
sh[:, 0] = rng.uniform(0, 1, (P, 3))
state = state._replace(
    xyz=jnp.asarray(xyz), scaling=jnp.asarray(scal), rotation=jnp.asarray(q),
    sh=jnp.asarray(sh),
    opacity=jnp.asarray(rng.uniform(0.5, 3.0, P), jnp.float32),
    status=jnp.full((P,), gm.UNSTABLE, jnp.int32),
    count=jnp.int32(P),
)
state = jax.block_until_ready(jax.tree.map(jnp.asarray, state))

cam = Camera(uid=0, c2w=np.eye(4), fx=0.9 * W, fy=0.9 * W, cx=W / 2,
             cy=H / 2, width=W, height=H)
cam_in = jax.tree.map(jnp.asarray, cam.render_inputs())
settings = RenderSettings(width=W, height=H)
bucket = P

gt_color = jnp.asarray(rng.uniform(0, 1, (H, W, 3)), jnp.float32)
gt_depth = jnp.asarray(rng.uniform(1, 5, (H, W)), jnp.float32)
gtn = rng.normal(size=(H, W, 3)).astype(np.float32)
gtn /= np.linalg.norm(gtn, axis=-1, keepdims=True) + 1e-8
gt_normal = jnp.asarray(gtn)
render_mask = jnp.ones((H, W), bool)

binning = compute_binning_state(state, cam_in, settings, "unstable", None,
                                bucket=bucket)
binning = jax.block_until_ready(binning)
print("entries:", int(binning.num_entries))

params0 = get_params(state)


def mk(fn):
    @jax.jit
    def run(params):
        def body(c, _):
            return fn(c), None
        (p,), _ = jax.lax.scan(body, (params,), None, length=ITERS)
        return p
    return run


def render_p(p):
    return render_state(set_params(state, p), cam_in, settings, "unstable",
                        None, bucket=bucket, binning=binning)


def base_terms(out):
    t = masked_mean(jnp.abs(out["render"] - gt_color), render_mask)
    de = out["depth"] - gt_depth
    vd = (out["depth_index_map"] != -1) & (gt_depth > 0) & render_mask
    return t + masked_mean(jnp.abs(de), vd)


def grad_of(loss_fn):
    def f(c):
        (params,) = c
        g = jax.grad(loss_fn)(params)
        return (jax.tree.map(lambda a, b: a - 1e-9 * b, params, g),)
    return f


# 1. base
def l_base(p):
    return base_terms(render_p(p))
print(f"base (color+depth):   {timeit(mk(grad_of(l_base)), params0):8.1f} ms/iter")


# 2. current normal loss
def l_norm(p):
    out = render_p(p)
    n = out["normal"]
    cos = 1.0 - jnp.sum(n * gt_normal, -1) / (
        jnp.linalg.norm(n, axis=-1) * jnp.linalg.norm(gt_normal, axis=-1) + 1e-8)
    vn = render_mask & (out["depth_index_map"] != -1)
    return base_terms(out) + 0.1 * masked_mean(cos, vn)
print(f"+normal (current):    {timeit(mk(grad_of(l_norm)), params0):8.1f} ms/iter")


# 3. stop-grad normal (fwd-only cost)
def l_norm_sg(p):
    out = render_p(p)
    n = jax.lax.stop_gradient(out["normal"])
    cos = 1.0 - jnp.sum(n * gt_normal, -1) / (
        jnp.linalg.norm(n, axis=-1) * jnp.linalg.norm(gt_normal, axis=-1) + 1e-8)
    vn = render_mask & (out["depth_index_map"] != -1)
    return base_terms(out) + 0.1 * masked_mean(cos, vn)
print(f"+normal stop-grad:    {timeit(mk(grad_of(l_norm_sg)), params0):8.1f} ms/iter")


# 4. linearity trick: scatter gt normals per gaussian once (constant), then
#    loss = C - <n_g, S_g> / denom. Exact same value when |n|=1 on hits.
def l_norm_lin(p):
    st = set_params(state, p)
    out = render_p(p)
    idx = jax.lax.stop_gradient(out["depth_index_map"])
    vn = render_mask & (idx != -1)
    u = jnp.where(vn[..., None], gt_normal, 0.0)
    S = jax.lax.stop_gradient(
        jnp.zeros((P, 3), jnp.float32).at[jnp.clip(idx, 0).reshape(-1)].add(
            u.reshape(-1, 3)))
    denom = jnp.maximum(vn.sum().astype(jnp.float32), 1.0)
    nw = st.get_normal()
    dot = jnp.sum(nw * S) / denom
    return base_terms(out) + 0.1 * (1.0 - dot)
print(f"+normal linear:       {timeit(mk(grad_of(l_norm_lin)), params0):8.1f} ms/iter")


# 5. raw scatter cost
idxr = jnp.asarray(rng.integers(0, P, H * W, dtype=np.int32))
vals = jnp.asarray(rng.normal(size=(H * W, 3)), jnp.float32)


@jax.jit
def scat(v):
    def body(c, _):
        s = jnp.zeros((P, 3), jnp.float32).at[idxr].add(v + c)
        return s[0, 0] * 1e-20, None
    out, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
    return out
print(f"scatter-add alone:    {timeit(scat, vals):8.1f} ms/iter")
