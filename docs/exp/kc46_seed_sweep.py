"""kc46 flagship seed sweep (round-4 VERDICT item 3; harvested round 5).

Runs the full two-stage kc46 curriculum (reference
kc46_lidar_config.json conventions, vanilla=true, bf16 + Pallas
training kernels) for several random seeds over the SAME dataset
(shared ``name``/``data_path`` -> the {name}_{stage} TFRecord cache is
built once and reused), so the sweep isolates training-seed variance
(init + augmentation + dropout; batch shuffle order is NOT varied —
the loader is seeded with the fixed rand_seed=42 in
train/profile.py:197, matching the deliberate seeded-shuffle fix over
the reference's unseeded ``random.shuffle``, PointCloudSet.py:243)
from dataset variance.

Usage:
  python docs/exp/kc46_seed_sweep.py [seed ...]   # run seeds, then harvest
  python docs/exp/kc46_seed_sweep.py --harvest    # re-summarize existing runs

Artifacts per seed: /tmp/kc46sweep/s{seed}/models/kc46_sweep/...
Summary rewritten at /tmp/kc46sweep/summary.jsonl (one row per seed dir).

Results (harvested for docs/TRAINING_PARITY.md "Round-5 addendum"):
seeds 7 / 123 / 2026 best final val seg accuracy 0.97867 / 0.97870 /
0.97870 (original run seed 42: 0.9787) — a ~3e-5 band; the reference's
0.9808 sits far outside it.
"""

import copy
import glob
import json
import os
import re
import sys
import time

BASE = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                    "kc46_bf16_full", "kc46_bf16_full_config.json")
ROOT = "/tmp/kc46sweep"

# Keras history-key names (the histories use the full metric names, e.g.
# val_segmentation_output_sparse_categorical_accuracy — NOT the short
# val_segmentation_accuracy this script looked up before round 5, which
# left summary.jsonl rows with no accuracy at all).
STAGE_KEYS = {
    "classification_pretrain":
        "val_classification_output_sparse_categorical_accuracy",
    "final": "val_segmentation_output_sparse_categorical_accuracy",
}


def harvest_seed(seed, row=None):
    """Read both stage histories for one seed dir into a summary row."""
    row = dict(row or {"seed": seed})
    for stage, key in STAGE_KEYS.items():
        hp = (f"{ROOT}/s{seed}/models/kc46_sweep/{stage}/"
              f"kc46_sweep_{stage}_history.json")
        if os.path.exists(hp):
            with open(hp) as f:
                h = json.load(f)
            if key in h and h[key]:
                row[f"{stage}_best"] = max(h[key])
                row[f"{stage}_epochs"] = len(h[key])
    return row


def harvest():
    """Rewrite summary.jsonl from whatever seed dirs exist on disk,
    preserving ok/wall_s from any previous rows."""
    prev = {}
    path = f"{ROOT}/summary.jsonl"
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                r = json.loads(line)
                prev[r["seed"]] = r
    rows = []
    for d in sorted(glob.glob(f"{ROOT}/s*")):
        m = re.fullmatch(r"s(\d+)", os.path.basename(d))
        if not m:
            continue
        seed = int(m.group(1))
        rows.append(harvest_seed(seed, prev.get(seed)))
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    for r in rows:
        print(r)
    return rows


def main(seeds):
    with open(BASE) as f:
        base = json.load(f)
    os.makedirs(ROOT, exist_ok=True)

    from pointcloudprocessing_tpu.train.profile import TrainProfile

    for seed in seeds:
        cfg = copy.deepcopy(base)
        cfg["info"]["name"] = "kc46_sweep"
        cfg["params"]["random_seed"] = seed
        cfg["file_system"] = {
            "model_path": f"{ROOT}/s{seed}/models/",
            "input_path": "/tmp/kc46full/input/",
            "data_path": "/tmp/kc46full/data/",
        }
        os.makedirs(f"{ROOT}/s{seed}/models/", exist_ok=True)
        cfg_path = f"{ROOT}/s{seed}/kc46_sweep_config.json"
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=1)

        print(f"=== seed {seed}: {cfg_path}", flush=True)
        t0 = time.time()
        tp = TrainProfile(cfg_path)
        ok = tp.train()
        wall = time.time() - t0

        row = harvest_seed(
            seed, {"seed": seed, "ok": bool(ok), "wall_s": round(wall, 1)})
        print(f"=== seed {seed} done: {row}", flush=True)
    harvest()


if __name__ == "__main__":
    if "--harvest" in sys.argv:
        harvest()
    else:
        main([int(s) for s in sys.argv[1:]] or [7, 123, 2026])
