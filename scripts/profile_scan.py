"""In-scan attribution of the optimize iteration cost at office0 scale.

Everything measured as a 10-iter lax.scan inside ONE jit on device-resident
data — immune to transfer/dispatch artifacts. Ablations:
  fwd            render forward, sum of color
  fwd+bwd        value_and_grad of color L1 only
  +loss          full compute_loss (ssim etc.)
  +adam          full optimize step
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
    import numpy as _np
    force = lambda o: _np.asarray(jax.tree.leaves(o)[0].ravel()[0])
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
from dqo_map_tpu.slam.mapper import (AdamState, adam_init, adam_update,
                                     compute_loss, get_params, set_params)
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
gt_normal = jnp.asarray(rng.normal(size=(H, W, 3)), jnp.float32)
render_mask = jnp.ones((H, W), bool)

binning = compute_binning_state(state, cam_in, settings, "unstable", None,
                                bucket=bucket)
binning = jax.block_until_ready(binning)
print("num_blocks:", int(binning.num_blocks), "entries:",
      int(binning.num_entries))

params0 = get_params(state)
opt0 = adam_init(params0)
lrs = {k: 0.001 for k in params0}
weights = {"depth": 1.0, "normal": 0.1, "color": 1.0, "ssim": 0.2}
image_input = {"color_map": gt_color, "depth_map": gt_depth,
               "normal_map": gt_normal, "render_mask": render_mask}
init_stat = {k: params0[k] for k in ("opacity", "scaling", "xyz", "rotation")}
opt_mask = state.status == gm.UNSTABLE


def mk(fn):
    @jax.jit
    def run(params, opt):
        def body(c, _):
            return fn(*c), None
        (p, o), _ = jax.lax.scan(body, (params, opt), None, length=ITERS)
        return p, o
    return run


def render_p(p):
    return render_state(set_params(state, p), cam_in, settings, "unstable",
                        None, bucket=bucket, binning=binning)

# 1. forward only
def f_fwd(params, opt):
    out = render_p(params)
    s = out["render"].sum() * 1e-9
    return jax.tree.map(lambda x: x + s, params), opt
print(f"fwd only:        {timeit(mk(f_fwd), params0, opt0):8.1f} ms/iter")

# 2. fwd+bwd color L1 only
def f_bwd(params, opt):
    def loss(p):
        out = render_p(p)
        return jnp.abs(out["render"] - gt_color).mean()
    g = jax.grad(loss)(params)
    return jax.tree.map(lambda a, b: a - 1e-9 * b, params, g), opt
print(f"fwd+bwd colorL1: {timeit(mk(f_bwd), params0, opt0):8.1f} ms/iter")

# 3. full loss fwd+bwd
def f_loss(params, opt):
    def loss(p):
        out = render_p(p)
        l, _ = compute_loss(out, image_input, p, init_stat, opt_mask, weights,
                            0.01, use_ssim=True)
        return l
    g = jax.grad(loss)(params)
    return jax.tree.map(lambda a, b: a - 1e-9 * b, params, g), opt
print(f"fwd+bwd full:    {timeit(mk(f_loss), params0, opt0):8.1f} ms/iter")

# 4. + adam
def f_adam(params, opt):
    def loss(p):
        out = render_p(p)
        l, _ = compute_loss(out, image_input, p, init_stat, opt_mask, weights,
                            0.01, use_ssim=True)
        return l
    g = jax.grad(loss)(params)
    params, opt = adam_update(params, g, opt, lrs, opt_mask)
    return params, opt
print(f"full step:       {timeit(mk(f_adam), params0, opt0):8.1f} ms/iter")


# ---- finer loss ablations (appended) ----
def mk_loss(parts):
    def f(params, opt):
        def loss(p):
            out = render_p(p)
            total = 0.0
            rm = render_mask
            if "color" in parts:
                total += masked_mean_(jnp.abs(out["render"] - gt_color), rm)
            if "depth" in parts:
                de = out["depth"] - gt_depth
                vd = (out["depth_index_map"] != -1) & (gt_depth > 0) & rm
                total += masked_mean_(jnp.abs(de), vd)
            if "normal" in parts:
                n = out["normal"]
                cos = 1.0 - jnp.sum(n * gt_normal, -1) / (
                    jnp.linalg.norm(n, axis=-1) * jnp.linalg.norm(gt_normal, axis=-1) + 1e-8)
                total += masked_mean_(cos, rm & (out["depth_index_map"] != -1))
            if "ssim" in parts:
                from dqo_map_tpu.utils.losses import ssim as ssim_
                total += 1.0 - ssim_(jnp.transpose(out["render"], (2, 0, 1)),
                                     jnp.transpose(gt_color, (2, 0, 1)))
            if "attach" in parts:
                init_op = jax.nn.sigmoid(init_stat["opacity"])
                am = (init_op < 0.9) & opt_mask
                total += 1000.0 * (
                    masked_mean_((p["scaling"] - init_stat["scaling"])**2, am)
                    + masked_mean_((p["xyz"] - init_stat["xyz"])**2, am)
                    + masked_mean_((p["rotation"] - init_stat["rotation"])**2, am))
            return total
        g = jax.grad(loss)(params)
        return jax.tree.map(lambda a, b: a - 1e-9 * b, params, g), opt
    return f

from dqo_map_tpu.slam.mapper import masked_mean as masked_mean_
for parts in (("color",), ("color", "depth"), ("color", "depth", "normal"),
              ("color", "depth", "normal", "ssim"),
              ("color", "depth", "normal", "ssim", "attach")):
    print(f"loss={'+'.join(parts):34s}: "
          f"{timeit(mk(mk_loss(parts)), params0, opt0):8.1f} ms/iter")
