"""Layered YAML config system with ``parent:`` inheritance.

Mirrors the reference semantics (`utils/config_utils.py:20-33`,
`arguments/__init__.py:110-210`): a child config names its parent and child
keys override parent keys; the merged namespace is then filtered into
per-subsystem parameter groups so each component only sees its own knobs.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field, fields
from typing import Any, List, Optional

import yaml


def read_config(config_path: str) -> dict:
    """Load a YAML config, walking the ``parent:`` chain (child overrides)."""
    with open(config_path, "r") as f:
        cfg = yaml.safe_load(f) or {}
    seen = {os.path.abspath(config_path)}
    while cfg.get("parent") not in (None, "None") and os.path.exists(cfg["parent"]):
        parent_path = cfg["parent"]
        if os.path.abspath(parent_path) in seen:
            break
        seen.add(os.path.abspath(parent_path))
        with open(parent_path, "r") as f:
            parent = yaml.safe_load(f) or {}
        grandparent = parent.get("parent")
        parent.update(cfg)
        cfg = parent
        cfg["parent"] = grandparent
    return cfg


def _extract(cls, cfg: dict):
    names = {f.name for f in fields(cls)}
    kwargs = {k: v for k, v in cfg.items() if k in names}
    return cls(**kwargs)


@dataclass
class DatasetParams:
    """Dataset layer knobs (ref `arguments/__init__.py:141-170`)."""

    type: str = "Replica"
    source_path: str = ""
    json_path: str = ""           # object-detection JSON (bbox + ellipse per frame)
    save_path: str = "output/run"
    frame_start: int = 0
    frame_step: int = 0
    frame_num: int = -1
    eval: bool = False
    eval_llff: int = 8
    resolution: int = 1
    resolution_scales: List[float] = field(default_factory=lambda: [1.0])
    preload: bool = False
    use_semantics: bool = False
    use_object: bool = False
    crop_edge: int = 0


@dataclass
class MapParams:
    """Gaussian map + renderer knobs (ref `arguments/__init__.py:173-210`,
    `configs/base.yaml`)."""

    save_path: str = "output/run"
    save_step: int = 2000
    mode: str = "single process"
    type: str = "Replica"
    verbose: bool = False
    use_tensorboard: bool = False

    # gaussian params
    active_sh_degree: int = 3
    max_sh_degree: int = 3
    xyz_factor: List[float] = field(default_factory=lambda: [1.0, 1.0, 0.1])
    init_opacity: float = 0.99
    scale_factor: float = 1.0
    max_radius: float = 0.05
    min_radius: float = 0.001

    # capacity (TPU-specific: fixed-shape arrays; grow-by-doubling on overflow)
    capacity: int = 1 << 19
    add_capacity: int = 1 << 16      # max gaussians added per frame
    initial_bucket: int = 4096       # render-bucket ladder start (recompiles
                                     # happen at each 4x rung; set to the
                                     # expected plateau to compile once)

    # map preprocess
    min_depth: float = 0.3
    max_depth: float = 5.0
    depth_filter: bool = False
    invalid_confidence_thresh: float = 0.2

    # map management
    memory_length: int = 5
    uniform_sample_num: int = 40800
    add_transmission_thres: float = 0.5
    transmission_sample_ratio: float = 1.0
    error_sample_ratio: float = 0.05
    add_depth_thres: float = 0.1
    add_color_thres: float = 0.1
    add_normal_thres: float = 1000.0
    history_merge_max_weight: float = 0.5
    stable_confidence_thres: float = 100.0
    unstable_time_window: int = 120
    KNN_num: int = 15
    KNN_threshold: float = -1.0

    # keyframes
    keyframe_trans_thes: float = 0.3
    keyframe_theta_thes: float = 30.0
    global_keyframe_num: int = 3

    # renderer
    renderer_opaque_threshold: float = 0.6
    renderer_normal_threshold: float = 60.0   # degrees
    renderer_depth_threshold: float = 1.0
    color_sigma: float = 3.0
    T_threshold: float = 0.0001
    tile_size: int = 16
    max_tiles_per_gaussian: int = 16          # binning duplication cap (TPU)
    # entry-budget knobs (truncation safety; see `ops/rasterize.entry_budget`).
    # Renders report `dropped_entries` when any cap bites; raise these if a
    # run ever warns about truncation.
    entry_cap: int = 1 << 20                  # static sorted-entry capacity
    entries_per_gaussian: int = 6             # expected tile duplication
    max_chunks_per_tile: int = 32             # per-tile entry cap / CHUNK
    initial_entry_rung: int = 1 << 16         # entry-cap ladder start (grows
                                              # by 2x toward entry_cap as
                                              # observed usage approaches)
    # compact-scan ladder starts (pin these at the workload plateau: every
    # mid-run rung move recompiles the optimize scan, which costs minutes
    # through a tunneled TPU)
    initial_ubucket: int = 8192               # unstable substate rows
    initial_uentry_rung: int = 1 << 15        # unstable-scan entry cap
    initial_gentry_rung: int = 1 << 18        # compact-global entry cap
    initial_gbucket: int = 16384              # compact-global substate rows
    # tile-duplication cap for the LOCAL optimize renders only: young
    # unstable gaussians dominate the entry mass (3-6 tiles each, with a
    # depth-edge tail that clips even at 16); halving their window keeps
    # the high-alpha center cells and cuts the scan's entry demand
    local_max_tiles_per_gaussian: int = 16

    # local-optimize render mode: "bg" composites the unstable render in
    # front of a per-scan pre-blended stable background (~10x cheaper per
    # iteration); "global" renders the full subset per iteration (exact
    # reference semantics, ref mapper.py:584)
    local_opt_mode: str = "bg"

    # optimize cadence
    gaussian_update_iter: int = 50
    gaussian_update_frame: int = 6
    final_global_iter: int = 20
    feature_lr_coef: float = 1.0
    scaling_lr_coef: float = 1.0
    rotation_lr_coef: float = 1.0
    semantic_lr_coef: float = 1.0
    object_lf_coef: float = 1.0

    # eval
    renderer_opaque_threshold_eval: float = 0.5
    pcd_densify: bool = False
    use_prune: bool = False      # visibility pruning via n_touched (USE_PURNE)


@dataclass
class OptimizationParams:
    """Loss weights + learning rates (ref `arguments/__init__.py:89-108`)."""

    position_lr: float = 0.001
    feature_lr: float = 0.0005
    opacity_lr: float = 0.0
    scaling_lr: float = 0.004
    rotation_lr: float = 0.001
    semantic_lr: float = 0.0005

    color_weight: float = 0.8
    depth_weight: float = 1.0
    ssim_weight: float = 0.2
    normal_weight: float = 0.0
    semantic_color_weight: float = 0.1
    object_weight: float = 0.1
    instance_weight: float = 0.8

    use_semantics: bool = False
    use_object: bool = False
    use_instance: bool = False
    association: str = "iou"     # object association variant: iou|qd|iou_qd
                                 # (ref ablation eval_obj/results_accociation)
    object_mode: int = 1         # ref mapper.py MODE: 1 = bbox-IoU refine
                                 # (shipped default), 0 = render-based
                                 # refine (from_Quadrics_to_Mode +
                                 # object_optimize + Update_Map)


@dataclass
class TrackingParams:
    """ICP / pose-backend knobs (ref `configs/base.yaml:91-112`)."""

    use_gt_pose: bool = False
    # reference base.yaml default (base.yaml:93). NOTE: A/B bench runs with
    # the fused-model-depth ICP reference showed consistent PSNR/ATE
    # degradation on the synthetic bench (receipts in BENCH_r04 series);
    # our hit-plane depth renders need investigation before enabling it by
    # default on real sequences.
    icp_use_model_depth: bool = False
    icp_downscales: List[float] = field(default_factory=lambda: [0.25, 0.5, 1.0])
    icp_downscale_iters: List[int] = field(default_factory=lambda: [5, 5, 5])
    icp_damping: float = 1e-4
    icp_distance_threshold: float = 0.1
    icp_normal_threshold: float = 20.0
    icp_sample_distance_threshold: float = 0.01
    icp_sample_normal_threshold: float = 0.01
    icp_warmup_frames: int = 0
    # NOTE: our failure metric is the mean-squared residual over the ICP's
    # final INLIER associations (see slam/icp.py:icp_pyramid docstring), not
    # the reference's unmasked pixelwise compare — thresholds are ~1e-4, not
    # the reference's 0.02
    icp_fail_threshold: float = 1e-4
    icp_min_valid_ratio: float = 0.3
    min_depth: float = 0.3
    max_depth: float = 5.0
    depth_filter: bool = False
    invalid_confidence_thresh: float = 0.2
    use_orb_backend: bool = False
    orb_vocab_path: str = ""
    orb_settings_path: str = ""
    orb_useicp: bool = True
    orb_max_feats: int = 1000
    orb_downsample: int = 1     # feature-tracking image subsample factor
                                # (2 = track at half res; ~4x cheaper on the
                                # host, keeps metric 3D geometry)
    orb_kf_gain: float = 1.0    # keyframe-anchor correction gain per
                                # frame (1.0 = hard override — 60f A/B:
                                # damped gains preserved drift; keep <1
                                # only for noisy-anchor regimes)
    orb_loop_closing: bool = True
    orb_loop_min_gap: int = 20
    orb_loop_min_inliers: int = 25
    orb_loop_every: int = 5
    tracker_max_fps: int = 30
    mode: str = "single process"
    verbose: bool = False
    use_gt_pose_first: bool = False


@dataclass
class ParallelParams:
    """Multi-chip scale-out knobs (TPU-native; no reference equivalent — the
    reference's only concurrency is 3 host processes over torch.mp queues,
    `SLAM/multiprocess/system.py`). When enabled and >1 JAX device exists,
    `Mapping.global_optimization` routes through the shard_map keyframe-DP
    optimizer (`parallel.dp.dp_optimize_scan`, keyframe batch sharded over
    ICI, map replicated) and the object layer's batched quadric refinement
    shards over the object axis."""

    parallel_enabled: bool = False
    parallel_devices: int = 0          # 0 = use all available devices
    parallel_keyframes: int = 0        # 0 = pad global_keyframe_num to the
                                       # mesh size; >0 = take this many
                                       # keyframes (rounded up to mesh size)


@dataclass
class SystemParams:
    """Pipeline / sync knobs for the overlapped tracker-mapper mode
    (ref `SLAM/multiprocess/system.py:19-44`)."""

    mode: str = "single process"
    sync_tracker2mapper_method: str = "strict"   # strict | loose | free
    sync_tracker2mapper_frames: int = 5
    system_verbose: bool = False
    record_mem: bool = False
    use_gui: bool = False


@dataclass
class Config:
    """Full merged config: raw dict plus typed parameter groups."""

    raw: dict
    dataset: DatasetParams
    map: MapParams
    opt: OptimizationParams
    tracking: TrackingParams
    system: SystemParams
    parallel: ParallelParams

    @staticmethod
    def from_yaml(path: str) -> "Config":
        raw = read_config(path)
        return Config.from_dict(raw)

    @staticmethod
    def from_dict(raw: dict) -> "Config":
        return Config(
            raw=raw,
            dataset=_extract(DatasetParams, raw),
            map=_extract(MapParams, raw),
            opt=_extract(OptimizationParams, raw),
            tracking=_extract(TrackingParams, raw),
            system=_extract(SystemParams, raw),
            parallel=_extract(ParallelParams, raw),
        )

    def get(self, key: str, default: Any = None) -> Any:
        return self.raw.get(key, default)

    def dump(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(self.raw, f)


def default_config(**overrides) -> Config:
    """A Config built from defaults, with flat-key overrides (used by tests)."""
    raw = {}
    for cls in (DatasetParams, MapParams, OptimizationParams, TrackingParams,
                SystemParams, ParallelParams):
        for f in fields(cls):
            if f.name not in raw:
                v = f.default
                if v is dataclasses.MISSING:
                    v = f.default_factory()  # type: ignore[misc]
                raw[f.name] = v
    raw.update(overrides)
    return Config.from_dict(raw)
