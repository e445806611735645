"""DQO-MAP-TPU: a TPU-native object-level RGB-D SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of DQO-MAP
(LiHaoy-ux/DQO-MAP: dual-quadric object layer + 3D-Gaussian-splatting map +
ICP tracking), built TPU-first:

- the CUDA tile rasterizer (`submodules/diff-gaussian-rasterizer-depth`)
  becomes an XLA sort-based binner + Pallas per-tile blend kernel with a
  custom VJP (`dqo_map_tpu.ops`),
- the three Gaussian clouds (`SLAM/multiprocess/mapper.py`) become one
  fixed-capacity structure-of-arrays with a status field so that
  promote/demote/delete are mask updates, not reallocation
  (`dqo_map_tpu.models.gaussian_map`),
- ICP (`SLAM/icp.py`) is a fully jitted coarse-to-fine Gauss-Newton scan
  (`dqo_map_tpu.slam.icp`),
- the per-object dual-quadric refinement (`SLAM/multiprocess/quadrics.py`)
  is a vmapped, masked Adam step over all objects at once
  (`dqo_map_tpu.models.quadrics`),
- multi-chip scaling uses `jax.sharding.Mesh` + collectives, not IPC
  (`dqo_map_tpu.parallel`).
"""

__version__ = "0.1.0"
