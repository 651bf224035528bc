#!/usr/bin/env python3
"""Diff two bench summaries (BENCH_LOCAL.json / BENCH_r{N}.json).

Prints the overlap count, the median new/old ratio over common queries,
total seconds each side, the top movers in both directions, and the
queries present on only one side — so every round's perf claims are
mechanically derived instead of reconstructed by hand (round-8 verdict
stretch #9).

Usage: python3 tools/benchdiff.py <old.json> <new.json> [topN]
"""
import json
import re
import statistics
import sys


def load(path):
    """Accept either graft.Bench's own summary ({"queries": {...}}) or
    the driver's BENCH_r{N}.json wrapper, whose full table may only
    survive as a front-truncated "tail" capture — recover what did.
    Returns (queries, floor) — floor is the per-query GC+codegen
    session overhead (seconds) Bench attributes to the best pass,
    empty for summaries that predate the field.
    """
    d = json.load(open(path))
    qs = d.get("queries")
    floor = d.get("floor") or {}
    if qs is None and isinstance(d.get("parsed"), dict):
        qs = d["parsed"].get("queries")
        floor = d["parsed"].get("floor") or {}
    if qs is None and isinstance(d.get("tail"), str):
        qs = {m.group(1): float(m.group(2)) for m in re.finditer(
            r'"(q[0-9]\w+)":(-?[0-9.]+)', d["tail"])}
    qs = {k: v for k, v in (qs or {}).items()
          if isinstance(v, (int, float)) and v >= 0}
    floor = {k: v for k, v in floor.items()
             if isinstance(v, (int, float)) and v >= 0}
    return qs, floor


def main(old_path, new_path, top=8):
    (old, old_floor), (new, new_floor) = load(old_path), load(new_path)
    common = sorted(set(old) & set(new))

    def adj(side, floor, q):
        """Floor-adjusted wall for SUB-0.5s queries: session overhead
        (GC + codegen) is fixed cost, not plan cost, and dominates the
        ratio exactly in that band (round-10 VERDICT: five 3x 'movers'
        were all sub-0.5s close queries under driver contention). The
        0.05s epsilon keeps adjusted ratios finite.
        """
        w = side[q]
        if w >= 0.5:
            return w
        return max(0.05, w - floor.get(q, 0.0))

    ratios = {q: (new[q] / old[q] if old[q] > 0 else float("inf"))
              for q in common}
    adj_ratios = {q: (adj(new, new_floor, q) / adj(old, old_floor, q)
                      if adj(old, old_floor, q) > 0 else float("inf"))
                  for q in common}
    print(f"old: {len(old)} queries, {sum(old.values()):.1f} s total")
    print(f"new: {len(new)} queries, {sum(new.values()):.1f} s total")
    # Round-12 (VERDICT r11 #8): the FLOOR-ADJUSTED median is the
    # official headline — sub-0.5s walls are dominated by session
    # overhead (GC + codegen), which the floor field measures per pass;
    # the raw median stays printed for continuity with earlier rounds.
    print(f"overlap: {len(common)} queries; "
          f"median ratio {statistics.median(adj_ratios.values()):.3f}x "
          f"floor-adjusted "
          f"(raw {statistics.median(ratios.values()):.3f}x)")
    movers = sorted(common, key=lambda q: adj_ratios[q])
    slow = [q for q in reversed(movers) if adj_ratios[q] > 1.3][:top]
    fast = [q for q in movers if adj_ratios[q] < 0.77][:top]
    if slow:
        print(f"\nslower (>1.3x), top {len(slow)} "
              "(floor-adj = ratio after subtracting GC+codegen floor "
              "from sub-0.5s walls):")
        for q in slow:
            print(f"  {q}: {old[q]:.3f} -> {new[q]:.3f} s "
                  f"({ratios[q]:.2f}x, floor-adj {adj_ratios[q]:.2f}x)")
        real = [q for q in common
                if adj_ratios[q] > 3.0 and new[q] >= 0.2]
        print(f"  floor-adjusted >3x count: {len(real)}"
              + (f" -> {' '.join(sorted(real))}" if real else ""))
    if fast:
        print(f"\nfaster (<0.77x), top {len(fast)}:")
        for q in fast:
            print(f"  {q}: {old[q]:.3f} -> {new[q]:.3f} s "
                  f"({ratios[q]:.2f}x)")
    only_new = sorted(set(new) - set(old))
    only_old = sorted(set(old) - set(new))
    if only_new:
        t = sum(new[q] for q in only_new)
        print(f"\nnew-only: {len(only_new)} queries, {t:.1f} s "
              f"(median {statistics.median(new[q] for q in only_new):.3f} s)")
    if only_old:
        print(f"old-only: {len(only_old)} queries: "
              f"{' '.join(only_old[:10])}{' ...' if len(only_old) > 10 else ''}")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 8)
