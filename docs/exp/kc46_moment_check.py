"""bf16-Adam-moment quality check at the kc46 fast regression point.

`optimizer_moment_dtype: "bfloat16"` (round-5 extension — both Adam moments
stored rounded; docs/PERF.md "Training-step wall") must not cost training
quality. This reruns the 1/6-scale kc46 regression config
(docs/artifacts/kc46_bf16_check/: 4 collects x 400 frames @ 8192 pts,
30-epoch cap, bf16 trunk + Pallas kernels; f32-moment result 0.9644) with
bf16 moments on bit-identical frames (deterministic per-collect seeds).

Usage:  python docs/exp/kc46_moment_check.py
Artifacts: /tmp/kc46mom/models/...; summary /tmp/kc46mom/summary.jsonl.
"""

import copy
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
BASE = os.path.join(REPO, "docs", "artifacts", "kc46_bf16_check",
                    "kc46_bf16_check_config.json")
ROOT = "/tmp/kc46mom"
INPUT = "/tmp/kc46v/input"

STAGE_KEYS = {
    "classification_pretrain":
        "val_classification_output_sparse_categorical_accuracy",
    "final": "val_segmentation_output_sparse_categorical_accuracy",
}


def ensure_data():
    if os.path.isdir(INPUT) and len(os.listdir(INPUT)) >= 4:
        return
    os.makedirs(INPUT, exist_ok=True)
    subprocess.run(
        [sys.executable,
         os.path.join(REPO, "examples", "make_kc46_like_data.py"),
         INPUT, "400"],
        check=True,
    )


def main():
    with open(BASE) as f:
        base = json.load(f)
    os.makedirs(ROOT, exist_ok=True)
    ensure_data()

    from pointcloudprocessing_tpu.train.profile import TrainProfile

    cfg = copy.deepcopy(base)
    cfg["info"]["name"] = "kc46_mom"
    cfg["params"]["optimizer_moment_dtype"] = "bfloat16"
    cfg["file_system"] = {
        "model_path": f"{ROOT}/models/",
        "input_path": f"{INPUT}/",
        "data_path": f"{ROOT}/data/",
    }
    os.makedirs(f"{ROOT}/models/", exist_ok=True)
    os.makedirs(f"{ROOT}/data/", exist_ok=True)
    cfg_path = f"{ROOT}/kc46_mom_config.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)

    t0 = time.time()
    tp = TrainProfile(cfg_path)
    ok = tp.train()
    row = {"moment_dtype": "bfloat16", "ok": bool(ok),
           "wall_s": round(time.time() - t0, 1)}
    for stage, key in STAGE_KEYS.items():
        hp = f"{ROOT}/models/kc46_mom/{stage}/kc46_mom_{stage}_history.json"
        if os.path.exists(hp):
            with open(hp) as f:
                h = json.load(f)
            if key in h and h[key]:
                row[f"{stage}_best"] = max(h[key])
                row[f"{stage}_epochs"] = len(h[key])
    with open(f"{ROOT}/summary.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print(f"=== kc46 bf16-moment check done: {row}", flush=True)


if __name__ == "__main__":
    main()
