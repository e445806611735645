"""Benchmark: tracking+mapping throughput at Replica-office0 scale.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Workload mirrors the reference's Replica office0 configuration
(`/root/reference/configs/replica_base.yaml:10-27`): 1200x680 frames,
40,800 uniform samples/frame, optimize every 6th frame x 50 iters,
5-frame memory window, 3 global keyframes. The FULL tracker runs
(`use_gt_pose=False` -> the ICP pyramid estimates every pose); fps counts
tracker+mapper wall time per frame, and the baseline is the 30 FPS north
star from BASELINE.json.

Two measurement passes over the same system:
  1. timing pass (async dispatch intact) -> headline FPS, p50/p95/max split
     by frame class (steady vs the every-6th-frame optimize cadence);
  2. profile pass (stage timers sync the device) -> per-stage ms table in
     `stages`, per frame class. The sync overhead makes stage sums slightly
     exceed the timing pass's frame times; the split, not the sum, is the
     receipt.

The JSON also reports `dropped_entries` (max render-entry truncation across
the run — MUST be 0 for an honest quality number), `entries_max` (peak
sorted-entry usage), `entries_per_s` (peak entries * fps), and
`warmup_s` (wall time of the pre-measurement frames, dominated by XLA
compiles; the persistent compilation cache makes re-runs warm up in
seconds).

Env knobs: BENCH_FRAMES, BENCH_W, BENCH_H, BENCH_WARMUP, BENCH_SAMPLES,
BENCH_BUCKET, BENCH_SPIKE_MS, BENCH_PROFILE_FRAMES; feature backend:
BENCH_ORB (default 1), BENCH_ORB_DS (image subsample), BENCH_KF_GAIN;
A/B switches: BENCH_ICP_MODEL (frame-to-model ICP reference),
BENCH_LOCAL_MODE (bg | global exact path); ladder pins: BENCH_ENTRY_RUNG,
BENCH_UBUCKET, BENCH_UENTRY, BENCH_GENTRY, BENCH_GBUCKET.
"""

import json
import os
import sys
import time


def main():
    # warmup must outlast every compile trigger: frame batches are padded to
    # static shapes and the render bucket starts at its plateau
    # (BENCH_BUCKET), so compiles happen in the first few optimize cadences.
    frames = int(os.environ.get("BENCH_FRAMES", 30))
    W = int(os.environ.get("BENCH_W", 1200))
    H = int(os.environ.get("BENCH_H", 680))
    # warmup 18: covers the first KEYFRAME global-optimize event (frame 17
    # — its compact-scan compile is minutes through the tunnel and must not
    # land in the measurement), and makes the window [18, 30) exactly two
    # 6-frame cadences (2 optimize events per 12 frames, the nominal mix),
    # while keeping the frame-29 eval point comparable across rounds
    warmup = int(os.environ.get("BENCH_WARMUP", 18))
    samples = int(os.environ.get("BENCH_SAMPLES", 40800))
    bucket = int(os.environ.get("BENCH_BUCKET", 1 << 18))
    spike_ms = float(os.environ.get("BENCH_SPIKE_MS", 1500.0))
    profile_frames = int(os.environ.get("BENCH_PROFILE_FRAMES", 12))

    from dqo_map_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    if os.environ.get("BENCH_LOG_COMPILES"):
        import jax
        jax.config.update("jax_log_compiles", True)

    from dqo_map_tpu.config import default_config
    from dqo_map_tpu.data.synthetic import synthetic_sequence
    from dqo_map_tpu.slam import mapper as mapper_mod
    from dqo_map_tpu.slam.system import SLAMSystem

    cfg = default_config(
        type="Synthetic", save_path="/tmp/bench_out", use_object=True,
        # icp_use_model_depth defaults OFF (reference base.yaml:93): the
        # r04 A/B series (BENCH_r04 tries 2-7) showed the fused-model-depth
        # ICP reference consistently degrades PSNR 27->18 and ATE
        # 0.55->4cm on this workload — our hit-plane depth render needs
        # work before it can serve as the ICP reference
        use_gt_pose=False,
        icp_use_model_depth=os.environ.get("BENCH_ICP_MODEL", "0") == "1",
        # the native feature backend (keyframe anchoring + covisibility
        # local BA) is ON by default: ICP-only frame-to-frame chaining
        # drifts ~1 mm/frame and collapses long runs (r04 receipts: 60-frame
        # ATE 5.17 -> 1.08 cm, PSNR 24.9 -> 28.3 at IDENTICAL throughput —
        # the host-side feature tracking hides under the device queue).
        # Parity of OUTCOME with the reference (which doesn't drift) beats
        # parity of its synthetic-config flag. BENCH_ORB=0 disables.
        use_orb_backend=os.environ.get("BENCH_ORB", "1") == "1",
        # full-res feature tracking + hard keyframe override: the 60-frame
        # A/B series (r05) measured ATE 1.42 cm (full-res, gain 0.35),
        # 1.96 (half-res, gain 0.6) vs r04's 1.08 with full-res hard
        # override — the toy gain sweep did not transfer (real keyframe
        # anchors are BA-refined and ~mm-accurate, so damping them only
        # preserves drift). Knobs stay for noisy-sensor tuning.
        orb_downsample=int(os.environ.get("BENCH_ORB_DS", 1)),
        orb_kf_gain=float(os.environ.get("BENCH_KF_GAIN", 1.0)),
        local_opt_mode=os.environ.get("BENCH_LOCAL_MODE", "bg"),
        capacity=1 << 19, add_capacity=16384, initial_bucket=bucket,
        # ladder plateaus for this workload — pinned so no rung moves (=
        # recompiles) happen mid-run; the JSON reports the end-of-run rungs
        # for re-tuning these
        initial_entry_rung=int(os.environ.get("BENCH_ENTRY_RUNG", 1 << 20)),
        initial_ubucket=int(os.environ.get("BENCH_UBUCKET", 1 << 17)),
        # chunk=128 local layout (r05): aligned unstable demand ~420k + the
        # ladder's 131k add-headroom fits 655360 (chunk-divisible); the old
        # 1M rung made the static pack gather/scatter 1.6x more expensive
        initial_uentry_rung=int(os.environ.get("BENCH_UENTRY", 655360)),
        initial_gentry_rung=int(os.environ.get("BENCH_GENTRY", 589824)),
        initial_gbucket=int(os.environ.get("BENCH_GBUCKET", 1 << 18)),
        uniform_sample_num=samples, gaussian_update_frame=6,
        gaussian_update_iter=50, stable_confidence_thres=20,
        global_keyframe_num=3,
        min_depth=0.1, max_depth=8.0, memory_length=5, save_step=10**9,
        # overlapped mode (ref slam_mp loose sync): the host never blocks on
        # the device queue inside a frame; readbacks ride async mirrors
        sync_tracker2mapper_method="loose", sync_tracker2mapper_frames=6,
    )
    total_frames = frames + profile_frames
    _, cams = synthetic_sequence(total_frames, width=W, height=H,
                                 with_detections=True)
    system = SLAMSystem(cfg, cameras=cams)

    update_every = cfg.map.gaussian_update_frame

    def frame_class(fid):
        # mapping() optimizes when (time+1) % update_frame == 0 or time == 0
        return "optimize" if ((fid + 1) % update_every == 0 or fid == 0) \
            else "steady"

    times, tr_times, mp_times = [], [], []
    cls_times = {"steady": [], "optimize": []}
    t_start = time.time()
    warmup_s = None
    for frame_id in range(frames):
        info = system.step(cams[frame_id], frame_id)
        system.mapping.time += 1
        total = info["tracker_s"] + info["mapper_s"]
        if frame_id == warmup - 1:
            warmup_s = time.time() - t_start
        if frame_id >= warmup:
            times.append(total)
            tr_times.append(info["tracker_s"])
            mp_times.append(info["mapper_s"])
            cls_times[frame_class(frame_id)].append(total)
        print(f"# frame {frame_id}: {1000*total:.1f} ms "
              f"(tracker {1000*info['tracker_s']:.1f})", file=sys.stderr)

    times_sorted = sorted(times)
    n = len(times_sorted)
    p50 = times_sorted[n // 2]
    p95 = times_sorted[min(n - 1, int(n * 0.95))]
    tmax = times_sorted[-1]
    spikes = sum(1 for t in times if t * 1000 > spike_ms)
    mean_s = sum(times) / n
    fps = 1.0 / mean_s

    # ---- quality receipts at the END OF THE TIMING PASS (frame `frames-1`)
    # — the apples-to-apples eval point across rounds (r02 evaluated frame
    # 29; r03 moved it after the profile pass, which made its PSNR/ATE
    # incomparable — VERDICT r03 Weak #2). The post-profile numbers are
    # reported separately as *_final.
    from dqo_map_tpu.eval.evaluate import eval_frame
    m_timed = eval_frame(system.mapping, cams[frames - 1], min_depth=0.1,
                         max_depth=8.0)
    ate_timed = system.tracker.eval_ate_series()

    # ---- profile pass: per-stage receipts (device-synced timers) ----
    mapper_mod.profile_enable(True)
    mapper_mod.stage_times(reset=True)
    stage_cls = {"steady": {}, "optimize": {}}
    for frame_id in range(frames, total_frames):
        system.step(cams[frame_id], frame_id)
        system.mapping.time += 1
        cls = frame_class(frame_id)
        for tag, ms in mapper_mod.stage_times(reset=True).items():
            stage_cls[cls].setdefault(tag, []).extend(ms)
    mapper_mod.profile_enable(False)

    stages = {}
    for cls, tags in stage_cls.items():
        stages[cls] = {}
        for tag, ms in sorted(tags.items()):
            mean_ms = sum(ms) / len(ms)
            entry = {"mean_ms": round(mean_ms, 1), "n": len(ms)}
            if "optimize_scan x" in tag:
                iters = int(tag.rsplit("x", 1)[1])
                entry["per_iter_ms"] = round(mean_ms / iters, 2)
            stages[cls][tag] = entry

    dropped, entries_max, clipped, tile_dropped = \
        system.mapping.dropped_entries()

    m = m_timed
    ate = ate_timed
    m_final = eval_frame(system.mapping, cams[total_frames - 1],
                         min_depth=0.1, max_depth=8.0)
    ate_final = system.tracker.eval_ate_series()
    print(f"# psnr={m['psnr']:.2f} depth_l1={m['depth_l1_cm']:.2f}cm "
          f"ate={ate:.2f}cm (frame {frames-1}); "
          f"final psnr={m_final['psnr']:.2f} ate={ate_final:.2f}cm",
          file=sys.stderr)
    print(f"# p50={1000*p50:.1f} p95={1000*p95:.1f} max={1000*tmax:.1f} ms"
          f"  tracker mean={1000*sum(tr_times)/n:.1f} "
          f"mapper mean={1000*sum(mp_times)/n:.1f}", file=sys.stderr)
    print(f"# dropped_entries={dropped} entries_max={entries_max}",
          file=sys.stderr)

    def cls_mean(c):
        v = cls_times[c]
        return round(1000 * sum(v) / len(v), 1) if v else None

    print(json.dumps({
        "metric": f"tracking+mapping FPS (synthetic office0-scale {W}x{H}, "
                  f"{samples} samples, full ICP, mean post-warmup)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 4),
        "p50_ms": round(1000 * p50, 1),
        "p95_ms": round(1000 * p95, 1),
        "max_ms": round(1000 * tmax, 1),
        "steady_frame_ms": cls_mean("steady"),
        "optimize_frame_ms": cls_mean("optimize"),
        "tracker_ms": round(1000 * sum(tr_times) / n, 1),
        "mapper_ms": round(1000 * sum(mp_times) / n, 1),
        "warmup_s": round(warmup_s, 1) if warmup_s else None,
        "dropped_entries": dropped,
        "tile_dropped": tile_dropped,
        "clipped_cells": clipped,
        "entries_max": entries_max,
        "entries_per_s": int(entries_max * fps),
        "stages": stages,
        "psnr": round(float(m["psnr"]), 2),
        "depth_l1_cm": round(float(m["depth_l1_cm"]), 2),
        "ate_cm": round(float(ate), 3),
        "eval_frame": frames - 1,
        "psnr_final": round(float(m_final["psnr"]), 2),
        "depth_l1_final_cm": round(float(m_final["depth_l1_cm"]), 2),
        "ate_full_cm": round(float(ate_final), 3),
        "icp_fail_count": system.tracker.icp_fail_count,
        "rungs": {
            "entry": system.mapping.entry_rung,
            "uentry": system.mapping.uentry_rung,
            "gentry": system.mapping.gentry_rung,
            "ubucket": system.mapping.ubucket,
            "bucket": system.mapping.bucket,
        },
        "frames_over_spike_ms": spikes,
    }))


if __name__ == "__main__":
    main()
