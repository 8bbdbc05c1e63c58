"""kc46 jitter-noise ablation — empirical confirmation of the label-noise
ceiling mechanism (docs/exp/kc46_noise_ceiling.py; TRAINING_PARITY.md
"Round-5 addendum").

Runs the full two-stage kc46 curriculum with the stage ``noise`` stdevs
overridden (default 0.05 m vs the configured 0.10 m), on the SAME input
frames as the flagship/seed-sweep runs (/tmp/kc46full/input). Prediction
from the NN-oracle analysis: the 0.05 m run's best val seg accuracy should
land just under its 0.9933 ceiling — i.e. clearly ABOVE both the 0.1 m
plateau (0.9787) and the reference's 0.9808 — demonstrating the training
machinery tracks the data ceiling, not a machinery-imposed optimum.

Usage:  python docs/exp/kc46_noise_ablation.py [stdev_m ...]
Artifacts per level: /tmp/kc46noise/n{stdev}/models/kc46_n{tag}/...
Summary appended to /tmp/kc46noise/summary.jsonl.
"""

import copy
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

BASE = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                    "kc46_bf16_full", "kc46_bf16_full_config.json")
ROOT = "/tmp/kc46noise"

STAGE_KEYS = {
    "classification_pretrain":
        "val_classification_output_sparse_categorical_accuracy",
    "final": "val_segmentation_output_sparse_categorical_accuracy",
}


def main(stdevs):
    with open(BASE) as f:
        base = json.load(f)
    os.makedirs(ROOT, exist_ok=True)

    from pointcloudprocessing_tpu.train.profile import TrainProfile

    for s in stdevs:
        tag = str(s).replace(".", "p")
        name = f"kc46_n{tag}"
        cfg = copy.deepcopy(base)
        cfg["info"]["name"] = name
        for stage in cfg["info"]["training_profiles"].values():
            stage["noise"] = {
                "x_stdev_m": s, "y_stdev_m": s, "z_stdev_m": s,
            }
        cfg["file_system"] = {
            "model_path": f"{ROOT}/n{tag}/models/",
            "input_path": "/tmp/kc46full/input/",
            # per-level data_path: the jitter stdev is captured in the
            # cached pc_set.joblib, so levels must not share a cache
            "data_path": f"{ROOT}/n{tag}/data/",
        }
        os.makedirs(f"{ROOT}/n{tag}/models/", exist_ok=True)
        os.makedirs(f"{ROOT}/n{tag}/data/", exist_ok=True)
        cfg_path = f"{ROOT}/n{tag}/{name}_config.json"
        with open(cfg_path, "w") as f:
            json.dump(cfg, f, indent=1)

        print(f"=== noise {s} m: {cfg_path}", flush=True)
        t0 = time.time()
        tp = TrainProfile(cfg_path)
        ok = tp.train()
        wall = time.time() - t0

        row = {"noise_stdev_m": s, "ok": bool(ok),
               "wall_s": round(wall, 1)}
        for stage, key in STAGE_KEYS.items():
            hp = (f"{ROOT}/n{tag}/models/{name}/{stage}/"
                  f"{name}_{stage}_history.json")
            if os.path.exists(hp):
                with open(hp) as f:
                    h = json.load(f)
                if key in h and h[key]:
                    row[f"{stage}_best"] = max(h[key])
                    row[f"{stage}_epochs"] = len(h[key])
        with open(f"{ROOT}/summary.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"=== noise {s} done: {row}", flush=True)


if __name__ == "__main__":
    main([float(s) for s in sys.argv[1:]] or [0.05])
