"""PointNet++ inference batch sweep (round-5 VERDICT item 6: one measured
lever or a floor statement).

The family benches at 7.5k clouds/s b256/1024pt since round 3; the round-3
hotspot work left it "compute-shaped" (docs/PERF.md "PointNet++ hotspots")
with ~5 ms of layout churn around the SA2 group MLPs. Larger batches
amortize per-dispatch overhead and give XLA bigger tiles for the group
MLPs; this sweep measures b256 / b512 / b1024 with the bench.py timing
methodology (pipelined independent dispatches, ONE host sync).

Usage:  python docs/exp/pn2_batch_sweep.py [batch ...]
Results recorded in docs/PERF.md.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import bench


def main(batches):
    for b in batches:
        # keep total dispatched work comparable across batch sizes
        steps = max(60 * 256 // b, 12)
        rate = bench.bench_infer_pointnet2(batch_size=b, steps=steps)
        print(f"[pn2] b{b} x 1024pt: {rate:.0f} clouds/s", flush=True)


if __name__ == "__main__":
    main([int(s) for s in sys.argv[1:]] or [256, 512, 1024])
