"""Focused A/B: pack_entries + blend fwd/bwd at office0 scale for the
current DQO_CHUNK. Minimal compile surface (3 jits)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from dqo_map_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp, numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000
W, H = 1200, 680
from dqo_map_tpu.config import default_config
from dqo_map_tpu.ops import binning as binning_mod
from dqo_map_tpu.ops.projection import preprocess
from dqo_map_tpu.ops.rasterize import RenderSettings, entry_budget
from dqo_map_tpu.ops.blend_pallas import CHUNK, BlendParams, _blend_core, pack_entries

rng = np.random.default_rng(0)
fx = fy = 600.0
K = jnp.asarray([[fx, 0, W/2], [0, fy, H/2], [0, 0, 1]], jnp.float32)
P_mat = np.zeros((4,4), np.float32)
P_mat[0,0]=2*fx/W; P_mat[1,1]=2*fy/H
P_mat[2,2]=100.0/(100.0-0.01); P_mat[2,3]=-(100.0*0.01)/(100.0-0.01); P_mat[3,2]=1.0
cam = {"w2c": jnp.eye(4), "full_proj": jnp.asarray(P_mat),
       "cam_pos": jnp.zeros(3), "K": K,
       "tan_fovx": jnp.float32(W/(2*fx)), "tan_fovy": jnp.float32(H/(2*fy))}
z = rng.uniform(0.8, 6.0, N).astype(np.float32)
u = rng.uniform(40, W-40, N).astype(np.float32)
v = rng.uniform(40, H-40, N).astype(np.float32)
xyz = jnp.asarray(np.stack([(u-W/2)/fx*z, (v-H/2)/fy*z, z], -1))
r_px = rng.uniform(3.0, 9.0, N).astype(np.float32)
s = (r_px*z/fx/3.0)
scales = jnp.asarray(np.stack([s, s, s*0.1], -1))
q = rng.normal(size=(N,4)).astype(np.float32); q /= np.linalg.norm(q, axis=1, keepdims=True)
q = jnp.asarray(q)
opac = jnp.full((N,), 0.8)
colors = jnp.asarray(rng.uniform(0, 1, (N,3)).astype(np.float32))

cfg = default_config()
settings = RenderSettings.from_args(W, H, cfg.map)
entry_cap, max_chunks = entry_budget(N, settings)
print(f"CHUNK={CHUNK} N={N} entry_cap={entry_cap} max_chunks={max_chunks}", flush=True)

pre = preprocess(xyz, scales, q, cam, 3.0, W, H)
b = binning_mod.bin_gaussians(pre, W, H, 16, 16, None, align=CHUNK,
                              entry_cap=entry_cap, max_chunks=max_chunks)
jax.block_until_ready(b.num_entries)
print(f"entries={int(b.num_entries)} blocks={int(b.num_blocks)} "
      f"dropped={int(b.dropped)} clipped={int(b.clipped)}", flush=True)

TH, TW = binning_mod.tile_grid_size(W, H, 16)
params = BlendParams(opaque_threshold=0.6, depth_threshold=1.0,
                     normal_threshold=0.5, T_threshold=1e-4)
scal = jnp.stack([K[0,0], K[1,1], K[0,2], K[1,2]]).astype(jnp.float32)
bg = (0.0, 0.0, 0.0)

@jax.jit
def packf(c):
    return pack_entries(pre, b, c, opac)

@jax.jit
def fwd(f):
    color, aux, nt = _blend_core(f, b.block_tile, b.num_blocks, scal,
                                 TH*TW, 16, TW, params, bg)
    return color

@jax.jit
def fwdbwd(f):
    def loss(ff):
        color, aux, nt = _blend_core(ff, b.block_tile, b.num_blocks, scal,
                                     TH*TW, 16, TW, params, bg)
        return jnp.sum(color[:, :, 0:4])
    return jax.grad(loss)(f)

def tmeas(name, fn, arg, n=20):
    out = fn(arg); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(arg)
    jax.block_until_ready(out)
    ms = (time.perf_counter()-t0)/n*1000
    print(f"{name:24s} {ms:8.2f} ms", flush=True)

feats = packf(colors)
tmeas("pack_entries", packf, colors)
tmeas("blend fwd", fwd, feats)
tmeas("blend fwd+bwd", fwdbwd, feats)
