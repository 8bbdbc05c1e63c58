"""Jitter label-noise ceiling for the kc46-like workload (round-5 VERDICT
item 2: identify the MECHANISM behind the systematic 0.9787-vs-0.9808 gap).

The training driver applies per-axis gaussian jitter (0.1 m, the reference
config's ``noise`` block) to train AND val pipelines while the per-point
part labels stay attached to the ORIGINAL surface point (reference
semantics: ``pointcloud/PointCloudSet.py:336-337`` jitters coordinates only).
A jittered point that lands in a region another part dominates is therefore
irreducibly mislabeled from the classifier's perspective — segmentation
accuracy on the jittered val set has a data-determined ceiling independent
of the model or training machinery.

This script estimates that ceiling with a nearest-neighbor oracle: for each
jittered val point, predict the part label of the nearest CLEAN point of the
same cloud (a geometry-perfect predictor), and measure agreement with the
target label. It runs for several jitter levels to place the 0.1 m operating
point on the difficulty curve.

Usage:  python docs/exp/kc46_noise_ceiling.py [n_clouds]
Reads the val split of the cached kc46 dataset (/tmp/kc46full/data).
Results recorded in docs/TRAINING_PARITY.md "Round-5 addendum".
"""

import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np
from scipy.spatial import cKDTree

from pointcloudprocessing_tpu.data.tfrecord import (
    decode_example,
    read_tfrecord_file,
)

DATA = "/tmp/kc46full/data/kc46_sweep_final"
WIDTH = 8192


def iter_val_clouds(limit):
    n = 0
    for path in sorted(glob.glob(f"{DATA}/*/val_*.tfrecord")):
        for buf in read_tfrecord_file(path):
            ex = decode_example(buf)
            pts = ex["observations"].reshape(WIDTH, 3).astype(np.float64)
            parts = ex["part_labels"].reshape(WIDTH).astype(np.int64)
            yield pts, parts
            n += 1
            if n >= limit:
                return


def main(n_clouds=200):
    rng = np.random.default_rng(0)
    stdevs = [0.0, 0.05, 0.1, 0.2]
    agree = {s: 0 for s in stdevs}
    total = 0
    clouds = list(iter_val_clouds(n_clouds))
    print(f"{len(clouds)} val clouds x {WIDTH} pts")
    for pts, parts in clouds:
        # repeat-padded ingest duplicates points; the oracle query must not
        # trivially hit the point's own duplicate, so dedup the CLEAN cloud
        # for the tree and carry a majority label per unique site
        uniq, idx = np.unique(pts, axis=0, return_inverse=True)
        lab = np.zeros(len(uniq), dtype=np.int64)
        for u in range(len(uniq)):
            lab[u] = -1
        # majority label per unique site (sites are exact duplicates, so
        # labels agree unless two distinct surface points coincide)
        for i, u in enumerate(idx):
            if lab[u] == -1:
                lab[u] = parts[i]
        tree = cKDTree(uniq)
        for s in stdevs:
            q = pts + rng.normal(0.0, s, pts.shape) if s else pts
            _, nn = tree.query(q, k=1, workers=-1)
            agree[s] += int((lab[nn] == parts).sum())
        total += WIDTH
    for s in stdevs:
        print(f"jitter {s:5.2f} m: NN-oracle val seg accuracy ceiling "
              f"= {agree[s] / total:.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)
