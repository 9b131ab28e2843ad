"""Batch-size throughput bracket for the whole-scene headline (VERDICT r3 #6).

Round 2 left batch-2 inside measurement noise: 6.27 M pts/s at batch 2 vs
6.03 M at batch 1 "in a window with 7.9% bracket drift". The north-star
metric is points/sec/chip (BASELINE.json:2), so a reproducible batching
gain is headline-relevant. This re-brackets cleanly: batch 1 → 2 → 4 →
batch 1 again, all at iters=40 (the §7 protocol), in ONE process; the
window is valid iff the two batch-1 measurements agree within 2%.

Usage: python scripts/study_batch_bracket.py [--iters 40]
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    from bench import bench_seg_whole_scene

    def measure(bs):
        out = bench_seg_whole_scene(bs, args.iters, scenes=("surface",),
                                    want_trace=False)
        e = out["surface"]
        row = {"batch": bs, "points_per_sec": e["points_per_sec"],
               "latency_ms": e["latency_ms"]}
        print("BRACKET " + json.dumps(row), flush=True)
        return row

    rows = [measure(1), measure(2), measure(4), measure(1)]
    b1a, b1b = rows[0]["points_per_sec"], rows[3]["points_per_sec"]
    drift = abs(b1a - b1b) / b1a
    base = min(b1a, b1b), max(b1a, b1b)
    verdict = {
        "drift": drift,
        "window_valid": drift <= 0.02,
        "batch2_gain_vs_worst_b1": rows[1]["points_per_sec"] / base[0] - 1,
        "batch2_gain_vs_best_b1": rows[1]["points_per_sec"] / base[1] - 1,
        "batch4_gain_vs_best_b1": rows[2]["points_per_sec"] / base[1] - 1,
    }
    print("VERDICT " + json.dumps(verdict))


if __name__ == "__main__":
    main()
