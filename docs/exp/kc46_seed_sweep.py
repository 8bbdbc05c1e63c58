"""kc46 flagship seed sweep (round-4 VERDICT item 3).

Runs the full two-stage kc46 curriculum (reference
kc46_lidar_config.json conventions, vanilla=true, bf16 + Pallas
training kernels) for several random seeds over the SAME dataset
(shared ``name``/``data_path`` -> the {name}_{stage} TFRecord cache is
built once and reused), so the sweep isolates training-seed variance
(init + augmentation + shuffle) from dataset variance.

Usage:  python docs/exp/kc46_seed_sweep.py [seed ...]
Artifacts per seed: /tmp/kc46sweep/s{seed}/models/kc46_sweep/...
Summary appended to /tmp/kc46sweep/summary.jsonl after each seed.
"""

import copy
import json
import os
import sys
import time

BASE = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                    "kc46_bf16_full", "kc46_bf16_full_config.json")
ROOT = "/tmp/kc46sweep"


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

        row = {"seed": seed, "ok": bool(ok), "wall_s": round(wall, 1)}
        for stage in ("classification_pretrain", "final"):
            hp = (f"{ROOT}/s{seed}/models/kc46_sweep/{stage}/"
                  f"kc46_sweep_{stage}_history.json")
            if os.path.exists(hp):
                with open(hp) as f:
                    h = json.load(f)
                key = ("val_classification_accuracy"
                       if stage == "classification_pretrain"
                       else "val_segmentation_accuracy")
                if key in h and h[key]:
                    row[f"{stage}_best"] = max(h[key])
                    row[f"{stage}_epochs"] = len(h[key])
        with open(f"{ROOT}/summary.jsonl", "a") as f:
            f.write(json.dumps(row) + "\n")
        print(f"=== seed {seed} done: {row}", flush=True)


if __name__ == "__main__":
    seeds = [int(s) for s in sys.argv[1:]] or [7, 123, 2026]
    main(seeds)
