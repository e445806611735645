"""SLAM entry point (equivalent of `slam.py`).

    python -m dqo_map_tpu.cli.run_slam --config configs/synthetic/room.yaml
"""

from __future__ import annotations

import argparse
import json
import os


def main():
    parser = argparse.ArgumentParser(description="DQO-MAP-TPU SLAM")
    parser.add_argument("--config", type=str,
                        default="configs/synthetic/room.yaml")
    parser.add_argument("--max-frames", type=int, default=-1)
    parser.add_argument("--eval-every", type=int, default=0)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--resume", type=str, default=None,
                        help="checkpoint path (without .npz) to resume from")
    parser.add_argument("--checkpoint-every", type=int, default=0)
    args = parser.parse_args()

    from ..config import Config
    from ..slam.system import SLAMSystem
    from ..utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()

    cfg = Config.from_yaml(args.config)
    os.makedirs(cfg.map.save_path, exist_ok=True)
    cfg.dump(os.path.join(cfg.map.save_path, "config.yaml"))

    system = SLAMSystem(cfg)
    start = system.resume(args.resume) if args.resume else 0
    eval_every = args.eval_every or cfg.map.save_step
    result = system.run(eval_every=eval_every, verbose=not args.quiet,
                        max_frames=args.max_frames, start_frame=start,
                        checkpoint_every=args.checkpoint_every)
    print(json.dumps({k: v for k, v in result.items()
                      if isinstance(v, (int, float, str, type(None)))},
                     indent=2))
    with open(os.path.join(cfg.map.save_path, "result.json"), "w") as f:
        json.dump({k: v for k, v in result.items()
                   if isinstance(v, (int, float, str, type(None)))}, f,
                  indent=2)


if __name__ == "__main__":
    main()
