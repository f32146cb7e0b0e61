#!/usr/bin/env python3
"""Diff two Bench outputs (bench_results.json, or any JSON line with a
"queries" map) — per-query delta sorted by regression, for round-over-round
comparison.

Usage: tools/bench_diff.py OLD.json NEW.json [--threshold 0.2]
"""
import json
import sys


def load(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)
    raise SystemExit(f"no bench JSON line found in {path}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thresh = 0.2
    for a in sys.argv[1:]:
        if a.startswith("--threshold"):
            thresh = float(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    rows = []
    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        if o is None or n is None:
            rows.append((float("inf"), name, o, n, "ADDED" if o is None else "REMOVED"))
        else:
            ratio = (n - o) / o if o > 0 else 0.0
            flag = "REGRESSED" if ratio > thresh else ("improved" if ratio < -thresh else "")
            rows.append((ratio, name, o, n, flag))
    rows.sort(key=lambda r: -r[0])
    print(f"{'query':<28}{'old s':>9}{'new s':>9}{'delta':>9}  flag")
    for ratio, name, o, n, flag in rows:
        os = f"{o:.2f}" if o is not None else "-"
        ns = f"{n:.2f}" if n is not None else "-"
        ds = f"{ratio * 100:+.0f}%" if o and n else "-"
        print(f"{name:<28}{os:>9}{ns:>9}{ds:>9}  {flag}")
    print(f"\ntotal: {old.get('value', 0):.1f} s -> {new.get('value', 0):.1f} s")


if __name__ == "__main__":
    main()
