"""DGCNN serving table (round-5 VERDICT item 3): perf/quality grid over the
two sanctioned serving levers — the static-graph opt-in (``graph='static'``)
and the graph size (``k``).

Two modes:

  python docs/exp/dgcnn_serving_table.py --bench
      TPU throughput grid: (graph, k) x {dynamic, static} at b64/1024pt,
      plus the 2048-pt serving width. Timing methodology = bench.py
      (pipelined independent dispatches, ONE host sync).

  python docs/exp/dgcnn_serving_table.py --quality
      CPU quality floor: the class-test miniature 4-way run
      (tests/test_class_test.py shapes) through the full TrainProfile
      driver per (graph, k) variant, exercising the new
      ``params.model_options`` config extension. Reports final train / best
      val accuracy per variant next to the throughput rows.

Results recorded in docs/PERF.md "DGCNN serving table".
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REPO = os.path.join(os.path.dirname(__file__), "..", "..")

VARIANTS = [
    ("dynamic", 20),  # canonical
    ("static", 20),
    ("dynamic", 10),
    ("static", 10),
]


def bench_mode():
    import bench

    rows = []
    for graph, k in VARIANTS:
        rate = bench.bench_infer_dgcnn(graph=graph, k=k)
        rows.append((graph, k, 1024, 64, rate))
        print(f"[bench] graph={graph} k={k} 1024pt b64: {rate:.0f} clouds/s",
              flush=True)
    for graph in ("dynamic", "static"):
        rate = bench.bench_infer_dgcnn(batch_size=32, width=2048, graph=graph)
        rows.append((graph, 20, 2048, 32, rate))
        print(f"[bench] graph={graph} k=20 2048pt b32: {rate:.0f} clouds/s",
              flush=True)
    print(json.dumps([{
        "graph": g, "k": k, "width": w, "batch": b,
        "clouds_per_s": round(r, 1)} for g, k, w, b, r in rows]))


def quality_mode():
    # mirror tests/test_class_test.py's miniature 4-way exercise
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import jax

    jax.config.update("jax_platforms", "cpu")
    from test_class_test import (
        CLASS_NAMES,
        N_CLASSES,
        WIDTH,
        _make_tiny_class_config,
    )

    from pointcloudprocessing_tpu.synthesis import (
        MeshSampler,
        dominant_axis_parts,
        shape_library,
        write_collect,
    )
    from pointcloudprocessing_tpu.train.profile import TrainProfile

    results = []
    for graph, k in VARIANTS:
        tmp = tempfile.mkdtemp(prefix=f"dgcnn_{graph}_{k}_")

        class _P:  # pathlib-free stand-in for the tmp_path fixture
            def __init__(self, root):
                self.root = root

            def __truediv__(self, name):
                return os.path.join(self.root, name)

        tmp_path = _P(tmp)
        in_dir = tmp_path / "input"
        os.makedirs(in_dir, exist_ok=True)
        meshes = shape_library(N_CLASSES)
        collects = []
        for i, ((_, mesh), class_name) in enumerate(
                zip(meshes.items(), CLASS_NAMES)):
            sampler = MeshSampler(None, class_name, mesh=mesh,
                                  random_seed=11 + i)
            obs, _, positions, dcms = sampler.create_viewpoint_observations(
                n=48, p=400, pad=WIDTH)
            parts = dominant_axis_parts(obs)
            collects.append(write_collect(
                os.path.join(in_dir, f"collect_{class_name}"),
                obs, class_name, parts, dcms=dcms, positions=positions))

        config_path = _make_tiny_class_config(tmp_path, collects)
        with open(config_path) as f:
            cfg = json.load(f)
        cfg["params"]["model"] = "dgcnn"
        cfg["params"]["model_options"] = {"graph": graph, "k": k}
        with open(config_path, "w") as f:
            json.dump(cfg, f)
        h = TrainProfile(config_path, log_to_file=False).train()
        hh = h["four_class_class"]
        row = {
            "graph": graph, "k": k,
            "final_train_acc": round(hh[
                "classification_output_sparse_categorical_accuracy"][-1], 4),
            "best_val_acc": round(max(hh[
                "val_classification_output_sparse_categorical_accuracy"]), 4),
        }
        results.append(row)
        print(f"[quality] {row}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    if "--quality" in sys.argv:
        quality_mode()
    else:
        bench_mode()
