"""Summarize an xplane trace into HLO-category buckets and top ops.

Usage: python scripts/trace_buckets.py /tmp/xp_dir [top_n]
Finds the newest vm.xplane.pb under the dir; prints per-category self time
and the top-N self-time ops with bandwidth/bound-by info.
"""

import glob
import json
import os
import sys
from collections import defaultdict


def main():
    root = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    steps = float(os.environ.get("TRACE_STEPS", "1"))  # divide totals
    paths = sorted(glob.glob(os.path.join(root, "**", "*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    path = paths[-1]
    from xprof.convert import raw_to_tool_data as r

    data, _ = r.xspace_to_tool_data([path], "hlo_stats", {})
    s = data.decode() if isinstance(data, bytes) else data
    d = json.loads(s)
    cols = [c["id"] for c in d["cols"]]
    idx = {c: i for i, c in enumerate(cols)}

    def val(row, col):
        v = row["c"][idx[col]]
        return v.get("v") if isinstance(v, dict) else v

    cat_time = defaultdict(float)
    ops = []
    total = 0.0
    for row in d["rows"]:
        t = float(val(row, "total_self_time") or 0.0) / 1e3 / steps  # us -> ms
        cat = val(row, "category")
        cat_time[cat] += t
        total += t
        ops.append((t, cat, val(row, "hlo_op_name"),
                    val(row, "measured_memory_bw"), val(row, "bound_by"),
                    val(row, "occurrences")))

    print(f"device self time: {total:.1f} ms over {steps:g} steps  ({path})")
    print("\n-- categories (ms/step) --")
    for cat, t in sorted(cat_time.items(), key=lambda kv: -kv[1]):
        if t / total > 0.002:
            print(f"{t:9.2f} ms  {100 * t / total:5.1f}%  {cat}")
    print(f"\n-- top {top_n} self-time ops (ms/step) --")
    for t, cat, name, bw, bound, occ in sorted(ops, reverse=True)[:top_n]:
        bw = f"{float(bw):.0f}" if bw else "?"
        print(f"{t:9.2f} ms  x{occ:>4}  {cat:22s} {bound or '':10s} "
              f"{bw:>6} GB/s  {str(name)[:70]}")

    # speed-of-light floor: HBM-bound ops scaled to peak bandwidth, others
    # kept at measured time (convs already run at ~peak MXU — BENCHLOG)
    peak = float(os.environ.get("HBM_PEAK_GBPS", "820"))
    floor = 0.0
    moved = 0.0
    for t, cat, name, bw, bound, occ in ops:
        if bound == "HBM" and bw:
            scale = min(float(bw) / peak, 1.0)
            floor += t * scale
            moved += t * float(bw) / 1e3  # ms * GB/s = GB... /1e3
        else:
            floor += t
    print(f"\nspeed-of-light floor (HBM ops at {peak:.0f} GB/s, rest as "
          f"measured): {floor:.1f} ms/step; HBM bytes {moved:.1f} GB/step")


if __name__ == "__main__":
    main()
