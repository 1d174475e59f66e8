"""Render the cross-pairing scaling table from the rep checkpoint log.

Reads KARGO_SCALING_LOG (default tools/scaling_r5_log.jsonl), groups reps
by core count, and prints per-config min/median throughput plus raw
min- and median-based efficiency for each N->4N pairing. Optionally takes
same-window pure-JVM calibration seconds (--calib 2=16.238,8=5.041,...)
and adds the calibration ceiling and ceiling-normalized efficiency per
pairing, so a host whose own codegen scaling collapses (sandboxed kernel,
neighbor steal) is visible next to the pipeline numbers instead of
silently deflating them.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics


def load(path: str) -> dict[int, list[dict]]:
    reps: dict[int, list[dict]] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                r = json.loads(line)
                reps.setdefault(int(r["cpus"]), []).append(r)
    return reps


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--log",
        default=os.environ.get("KARGO_SCALING_LOG", "tools/scaling_r5_log.jsonl"),
    )
    ap.add_argument("--pairings", default="2:8,4:16,8:32")
    ap.add_argument("--calib", default="", help="cpus=sec,... same-window JVM codegen")
    args = ap.parse_args()

    reps = load(args.log)
    calib = {
        int(k): float(v)
        for k, v in (kv.split("=") for kv in args.calib.split(",") if kv)
    }

    print(f"{'cores':>5} {'reps':>4} {'min s':>8} {'med s':>8} "
          f"{'min d/s':>8} {'med d/s':>8} {'loads':<24} triples")
    stats = {}
    for c in sorted(reps):
        secs = [r["sec"] for r in reps[c]]
        n_docs = reps[c][0]["n_docs"]
        tri = {r["n_triples"] for r in reps[c]}
        stats[c] = {
            "min_dps": n_docs / min(secs),
            "med_dps": n_docs / statistics.median(secs),
        }
        print(f"{c:>5} {len(secs):>4} {min(secs):>8.1f} "
              f"{statistics.median(secs):>8.1f} {stats[c]['min_dps']:>8.2f} "
              f"{stats[c]['med_dps']:>8.2f} "
              f"{str([r['loadavg_1m'] for r in reps[c]]):<24} {sorted(tri)}")

    print()
    for pair in args.pairings.split(","):
        lo, hi = (int(x) for x in pair.split(":"))
        if lo not in stats or hi not in stats:
            print(f"{lo}->{hi}: skipped (no reps logged for "
                  f"{[c for c in (lo, hi) if c not in stats]})")
            continue
        f = hi / lo
        row = (f"{lo}->{hi}: raw eff min={stats[hi]['min_dps'] / (f * stats[lo]['min_dps']):.3f} "
               f"median={stats[hi]['med_dps'] / (f * stats[lo]['med_dps']):.3f}")
        if lo in calib and hi in calib:
            ceiling = (calib[lo] / calib[hi]) / f
            row += (f"  | jvm ceiling={ceiling:.3f} "
                    f"norm min={stats[hi]['min_dps'] / (f * stats[lo]['min_dps']) / ceiling:.2f} "
                    f"median={stats[hi]['med_dps'] / (f * stats[lo]['med_dps']) / ceiling:.2f}")
        print(row)


if __name__ == "__main__":
    main()
