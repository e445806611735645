#!/usr/bin/env bash
# Fetch the Replica SLAM sequences (office0..room2, the NICE-SLAM/iMAP
# renderings the reference benchmarks on) + the TUM RGB-D fr1_desk sequence.
#
# The reference evaluates on these exact captures (BASELINE.md: Replica
# office0 @ 30 FPS north star; configs/replica_base.yaml). This box has no
# network egress, so the repo's own benchmark numbers come from the
# synthetic office0-scale workload (bench.py) — run this script on a
# connected machine, then:
#
#   python -m dqo_map_tpu.cli.run_slam --config configs/replica/office0.yaml
#   python -m dqo_map_tpu.cli.metric  --config configs/replica/office0.yaml
#
set -euo pipefail

DATA_DIR="${1:-data}"
mkdir -p "$DATA_DIR"

# --- Replica (NICE-SLAM packaging: color/depth pngs + traj.txt) -----------
REPLICA_URL="https://cvg-data.inf.ethz.ch/nice-slam/data/Replica.zip"
if [ ! -d "$DATA_DIR/Replica" ]; then
  echo "downloading Replica sequences (~12 GB)..."
  curl -L "$REPLICA_URL" -o "$DATA_DIR/Replica.zip"
  unzip -q "$DATA_DIR/Replica.zip" -d "$DATA_DIR"
  rm -f "$DATA_DIR/Replica.zip"
fi

# --- TUM RGB-D fr1_desk / fr3_office --------------------------------------
TUM_BASE="https://cvg.cit.tum.de/rgbd/dataset"
for seq in freiburg1/rgbd_dataset_freiburg1_desk \
           freiburg3/rgbd_dataset_freiburg3_long_office_household; do
  name=$(basename "$seq")
  if [ ! -d "$DATA_DIR/TUM/$name" ]; then
    echo "downloading $name..."
    mkdir -p "$DATA_DIR/TUM"
    curl -L "$TUM_BASE/$seq.tgz" -o "$DATA_DIR/TUM/$name.tgz"
    tar -xzf "$DATA_DIR/TUM/$name.tgz" -C "$DATA_DIR/TUM"
    rm -f "$DATA_DIR/TUM/$name.tgz"
  fi
done

echo "done. point configs/replica/*.yaml source_path at $DATA_DIR/Replica/<scene>"
