#!/usr/bin/env python3
"""Scaling-exponent table: sf0.01 -> sf0.1 wall-time ratios per query.

Usage: tools/scaling.py bench_sf001.json bench_sf01.json [topN]

Emits a markdown table of the topN queries by sf0.1 wall time with the
measured ratio t(sf0.1)/t(sf0.01) and the implied exponent
log10(ratio) (data grows 10x between the two SFs, so ratio 10 = linear,
ratio 100 = quadratic). Sub-second sf0.01 times are noise-dominated by
Spark's per-job floor (~50-200 ms scheduling + codegen reuse), so the
exponent column is only meaningful when the sf0.01 time clears ~0.5 s;
rows below that are marked 'floor'.
"""
import json
import math
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))["queries"]
    big_doc = json.load(open(sys.argv[2]))
    big = big_doc["queries"]
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    rows = sorted(big.items(), key=lambda kv: -kv[1])[:top_n]
    print("| query | sf0.01 s | sf0.1 s | ratio | exponent |")
    print("|---|---|---|---|---|")
    for name, t_big in rows:
        t_small = small.get(name)
        if t_small is None or t_small <= 0:
            print(f"| {name} | — | {t_big:.2f} | — | — |")
            continue
        ratio = t_big / t_small
        expo = math.log10(ratio) if ratio > 0 else float("nan")
        note = f"{expo:.2f}" if t_small >= 0.5 else f"{expo:.2f} (floor)"
        print(f"| {name} | {t_small:.2f} | {t_big:.2f} | {ratio:.1f}x | {note} |")


if __name__ == "__main__":
    main()
