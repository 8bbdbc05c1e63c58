"""Timeline idle-gap analysis of the scanned train step (round-5 VERDICT
item 5, stage 2).

docs/exp/mosaic_call_overhead.py measured the per-Mosaic-call overhead at
~0 us/call (slope of per-iteration time vs calls-per-iteration is -2.5 us,
i.e. noise; jnp control -2.3 us), which kills the round-3 attribution of
the ~0.17 ms/step in-loop gap to "serialization around the six Mosaic
custom calls". This script finds where the gap actually is: it traces the
production scanned train step (chunk 32, b32/1024 pt, bf16 — the bench
config) and, instead of summing op durations like tools/trace_ops.py,
reconstructs the DEVICE TIMELINE of the while-loop body: merged busy
intervals, total idle, and the top idle gaps keyed by the (op before, op
after) pair so the mechanism is readable directly from the report.

Usage:  python docs/exp/trainstep_gap_trace.py
Results recorded in docs/PERF.md ("Training-step wall" round-5 note).
"""

from __future__ import annotations

import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, os.path.join(REPO, "tools"))


def analyze(trace_dir: str, steps: int, top: int = 25) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")

    events = []  # (start_ps, end_ps, name)
    asyncs = []  # occupancy spans (DMA in flight): (start_ps, end_ps, name)
    parents = []  # %while spans: (start_ps, end_ps)
    for path in paths:
        space = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            space.ParseFromString(f.read())
        for plane in space.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name.lower():
                continue
            for line in plane.lines:
                if "XLA Ops" not in line.name:
                    continue
                base = line.timestamp_ns * 1000
                for ev in line.events:
                    meta = plane.event_metadata[ev.metadata_id]
                    name = meta.name.split(" = ")[0]
                    s = base + ev.offset_ps
                    e = s + ev.duration_ps
                    if name.startswith("%while"):
                        parents.append((s, e))
                    elif name.startswith(("%copy-start", "%slice-start",
                                          "%all-reduce-start", "%collective",
                                          "%async", "%copy-done",
                                          "%slice-done", "%dynamic-update",
                                          "%dynamic-slice-start")):
                        asyncs.append((s, e, name))
                    else:
                        events.append((s, e, name))

    if not parents:
        raise SystemExit("no %while parent span found")
    # largest while span = ONE dispatch of the scan: `steps` = its chunk
    # length (the earlier revision divided by total steps across dispatches,
    # halving every per-step number)
    w_s, w_e = max(parents, key=lambda p: p[1] - p[0])
    inside = sorted(e for e in events if e[0] >= w_s and e[1] <= w_e)
    span_us = (w_e - w_s) / 1e6
    print(f"while span: {span_us:.0f} us over {steps} scanned steps "
          f"({span_us / steps:.1f} us/step); {len(inside)} events inside")

    # merge busy intervals; record gaps with their neighbors
    gaps = []  # (gap_us, name_before, name_after, t_rel_us)
    cur_s, cur_e, last_name = inside[0][0], inside[0][1], inside[0][2]
    busy = 0
    for s, e, name in inside[1:]:
        if s > cur_e:
            gaps.append(((s - cur_e) / 1e6, last_name, name,
                         (cur_e - w_s) / 1e6))
            busy += cur_e - cur_s
            cur_s, cur_e, last_name = s, e, name
        else:
            if e > cur_e:
                cur_e, last_name = e, name
    busy += cur_e - cur_s
    busy_us = busy / 1e6
    idle_us = span_us - busy_us
    print(f"busy {busy_us:.0f} us ({busy_us / steps:.1f} us/step), "
          f"idle {idle_us:.0f} us ({idle_us / steps:.1f} us/step, "
          f"{100 * idle_us / span_us:.1f}% of span)")

    by_pair: dict[tuple, list] = collections.defaultdict(list)
    windows: dict[tuple, tuple] = {}
    for g, nb, na, t_end in gaps:
        key = (nb[:70], na[:70])
        by_pair[key].append(g)
        if key not in windows or g > windows[key][0]:
            # keep the LARGEST instance's absolute window for DMA overlap
            windows[key] = (g, w_s + int(t_end * 1e6),
                            w_s + int((t_end + g) * 1e6))
    print(f"\n{len(gaps)} gaps total; top pairs by total idle:")
    rows = sorted(by_pair.items(), key=lambda kv: -sum(kv[1]))
    for (nb, na), gs in rows[:top]:
        print(f"  {sum(gs) / steps:7.1f} us/step  n/step={len(gs) / steps:5.1f} "
              f"max={max(gs):6.1f}us\n"
              f"        after  {nb}\n        before {na}")
        # what DMA / async activity spans the largest instance of this gap?
        _, g_s, g_e = windows[(nb, na)]
        over = [(s, e, n) for s, e, n in asyncs if s < g_e and e > g_s]
        if over:
            tot = collections.defaultdict(float)
            for s, e, n in over:
                tot[n.split(".")[0]] += (min(e, g_e) - max(s, g_s)) / 1e6
            cov = ", ".join(f"{k}={v:.1f}us" for k, v in
                            sorted(tot.items(), key=lambda kv: -kv[1])[:4])
            print(f"        in-flight during largest instance: {cov}")
        else:
            print("        in-flight during largest instance: NOTHING "
                  "(pure scheduling stall)")


def main() -> None:
    import trace_ops  # tools/ is on sys.path (no package __init__)

    trace_dir = tempfile.mkdtemp(prefix="trace_gaps_")
    trace_ops._TRACE_DIR = trace_dir
    trace_ops._run_train()
    print(f"trace dir: {trace_dir}")
    analyze(trace_dir, steps=32)  # chunk length of one scanned dispatch


if __name__ == "__main__":
    main()
