#!/usr/bin/env python3
"""Diff two graft Bench JSON lines (or BENCH_r*.json driver artifacts).

Usage: bench_diff.py <fileA> <fileB> [minRatio]
Accepts either a raw one-line {"metric":...} dump or a driver artifact
whose "tail" field embeds (a suffix of) that line. Prints per-key
ratios B/A sorted by |log ratio|, plus shared-key sums and the
calibration triplets when present.
"""
import json, math, re, sys


def load(path):
    txt = open(path).read()
    try:
        j = json.loads(txt)
        if isinstance(j, dict) and "tail" in j:
            txt = j["tail"]
    except json.JSONDecodeError:
        pass
    # grab calibration, then CUT it off — its keys repeat queries keys
    cal = None
    mc = re.search(r'"calibration":(\{.*?\}\})', txt)
    if mc:
        cal = json.loads(mc[1])
        txt = txt[:mc.start()]
    # find the queries map (may be truncated at the front in artifacts)
    m = re.search(r'"queries":\{', txt)
    frag = txt[m.end():] if m else txt
    qs = {}
    # full float pattern: [0-9.]+ alone would truncate 9.1e-05 to 9.1
    for k, v in re.findall(
            r'"([A-Za-z0-9_]+)":(-?[0-9.]+(?:[eE][+-]?[0-9]+)?)', frag):
        if k not in ("value", "sf", "n", "rc", "cpus", "mult"):
            qs[k] = float(v)
    return qs, cal


def main():
    a, calA = load(sys.argv[1])
    b, calB = load(sys.argv[2])
    min_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    shared = sorted(set(a) & set(b))
    sa = sum(a[k] for k in shared)
    sb = sum(b[k] for k in shared)
    print(f"shared keys: {len(shared)}  sumA={sa:.1f}s  sumB={sb:.1f}s  "
          f"ratio={sb / sa:.2f}")
    if calA and calB:
        print(f"calA={calA}  calB={calB}")
    rows = [(k, a[k], b[k], b[k] / max(a[k], 1e-9)) for k in shared]
    rows.sort(key=lambda r: -abs(math.log(max(r[3], 1e-9))))
    for k, va, vb, r in rows:
        if r >= min_ratio or r <= 1 / min_ratio:
            print(f"{k:28s} {va:7.3f} -> {vb:7.3f}  {r:5.2f}x")


if __name__ == "__main__":
    main()
