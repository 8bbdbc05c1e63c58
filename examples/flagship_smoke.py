"""End-to-end flagship smoke: synthesize -> ingest -> train -> serve.

Exercises the full production path at a realistic shape: 4-class
MeshSampler data at 8192 points/frame, the bertha-style config,
TrainProfile with chunked dispatch + bf16, stage artifacts, and the
serving CLI over a fresh collect. On the TPU this takes ~4 minutes
(mostly first-compile); it also runs on CPU at reduced shapes.

Run: python examples/flagship_smoke.py
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from make_class_test_data import synthesize_class_collects
from make_class_test_configs import build_config

root = tempfile.mkdtemp(prefix="flagship_")
print("workdir:", root, flush=True)
data_dir = os.path.join(root, "data")
os.makedirs(os.path.join(root, "models"), exist_ok=True)

t0 = time.time()
collects = synthesize_class_collects(
    data_dir, 4, frames_per_class=64, sample_points=4096, pad=8192
)
print(f"synthesized 4x64 frames @8192pts in {time.time()-t0:.0f}s", flush=True)

cfg = build_config("four", 4)
for stage in cfg["info"]["training_profiles"].values():
    stage["datasets"] = {str(i): os.path.basename(c) for i, c in enumerate(collects)}
cfg["params"].update({
    "input_width": 8192, "epochs": 3, "batch_size": 16,
    "compute_dtype": "bfloat16",
    "learning": {"rate": 1e-3, "decay_steps": 1000, "decay_rate": 0.9},
})
cfg["file_system"] = {
    "model_path": os.path.join(root, "models") + "/",
    "input_path": data_dir + "/",
    "data_path": data_dir + "/",
}
config_path = os.path.join(root, "bertha_four_class_config.json")
with open(config_path, "w") as f:
    json.dump(cfg, f)

from pointcloudprocessing_tpu.train.profile import TrainProfile

t0 = time.time()
tp = TrainProfile(config_path, log_to_file=False)
print(f"ingest done in {time.time()-t0:.0f}s", flush=True)

t0 = time.time()
histories = tp.train()
print(f"training (2 stages x 3 epochs, b16/w8192, bf16) in {time.time()-t0:.0f}s", flush=True)
for stage, h in histories.items():
    print(f"  {stage}: loss {h['loss'][0]:.3f} -> {h['loss'][-1]:.3f}, "
          f"cls acc {h['classification_output_sparse_categorical_accuracy'][-1]:.3f}, "
          f"val acc {h['val_classification_output_sparse_categorical_accuracy'][-1]:.3f}",
          flush=True)

# serve over one collect with the final stage
from pointcloudprocessing_tpu.serve import main as serve_main

stage_dir = os.path.join(root, "models", cfg["info"]["name"], "four_class_seg")
out_path = os.path.join(root, "preds.jsonl")
t0 = time.time()
rc = serve_main(["--model", stage_dir, "--input", collects[0],
                 "--output", out_path, "--batch", "16"])
records = [json.loads(line) for line in open(out_path)]
print(f"serve rc={rc}: {len(records)} frames in {time.time()-t0:.0f}s; "
      f"first: {records[0]['class']}, parts={list(records[0]['part_counts'])[:3]}",
      flush=True)

shutil.rmtree(root, ignore_errors=True)
print("flagship smoke OK", flush=True)
