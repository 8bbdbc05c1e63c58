"""f15 flagship second-seed check (round-5 VERDICT item 7): the f15 claim
(0.9471 vs ref 0.7874, TRAINING_PARITY.md round-3 addendum) rested on one
seed; this runs the same full two-stage T-Net curriculum at another seed to
quantify its band.

The f15 dataset cache from round 3 is gone from /tmp, so the script
regenerates the same-shape workload first (5 collects x 2,400 frames of
8,192 pts via examples/make_f15_like_data.py — deterministic per-collect
seeds, so the frames are bit-identical to the round-3 workload) unless the
input dir already exists.

Usage:  python docs/exp/f15_seed_check.py [seed ...]   (default 7)
Artifacts per seed: /tmp/f15seed/s{seed}/models/f15_seed/...
Summary appended to /tmp/f15seed/summary.jsonl.
"""

import copy
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
BASE = os.path.join(REPO, "docs", "artifacts", "f15_like",
                    "f15_like_config.json")
ROOT = "/tmp/f15seed"
INPUT = f"{ROOT}/input"

STAGE_KEYS = {
    "classification_pretrain":
        "val_classification_output_sparse_categorical_accuracy",
    "final": "val_segmentation_output_sparse_categorical_accuracy",
}


def ensure_data():
    if os.path.isdir(INPUT) and len(os.listdir(INPUT)) >= 5:
        return
    os.makedirs(INPUT, exist_ok=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "make_f15_like_data.py"),
         INPUT],
        check=True,
    )


def main(seeds):
    with open(BASE) as f:
        base = json.load(f)
    os.makedirs(ROOT, exist_ok=True)
    ensure_data()

    from pointcloudprocessing_tpu.train.profile import TrainProfile

    for seed in seeds:
        cfg = copy.deepcopy(base)
        cfg["info"]["name"] = "f15_seed"
        cfg["params"]["random_seed"] = seed
        cfg["file_system"] = {
            "model_path": f"{ROOT}/s{seed}/models/",
            "input_path": f"{INPUT}/",
            "data_path": f"{ROOT}/data/",  # shared TFRecord cache
        }
        os.makedirs(f"{ROOT}/s{seed}/models/", exist_ok=True)
        os.makedirs(f"{ROOT}/data/", exist_ok=True)
        cfg_path = f"{ROOT}/s{seed}/f15_seed_config.json"
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=1)

        print(f"=== f15 seed {seed}: {cfg_path}", flush=True)
        t0 = time.time()
        tp = TrainProfile(cfg_path)
        ok = tp.train()
        wall = time.time() - t0

        row = {"seed": seed, "ok": bool(ok), "wall_s": round(wall, 1)}
        for stage, key in STAGE_KEYS.items():
            hp = (f"{ROOT}/s{seed}/models/f15_seed/{stage}/"
                  f"f15_seed_{stage}_history.json")
            if os.path.exists(hp):
                with open(hp) as f:
                    h = json.load(f)
                if key in h and h[key]:
                    row[f"{stage}_best"] = max(h[key])
                    row[f"{stage}_epochs"] = len(h[key])
        with open(f"{ROOT}/summary.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"=== f15 seed {seed} done: {row}", flush=True)


if __name__ == "__main__":
    main([int(s) for s in sys.argv[1:]] or [7])
