#!/usr/bin/env python3
"""Layout-cost accounting over a bench artifact.

Reads a bench JSON — either the full `bench_out.json` (carries the
per-layout `layouts` map in seconds) or an archived final line / BENCH_r
file (carries the compact per-family `layout_ds` map in deciseconds) —
and prints:

  - total wall, layout-build seconds, and the layout-subtracted total
    (what a warm in-JVM rerun of the same HEAD should approach);
  - per query family (the layout-name prefix: io/text/vec), the layout
    seconds a cold run charged to that family's first-touching queries.

Usage: tools/bench_layout.py <bench.json> [more.json ...]
"""
import json
import sys


def load(path):
    with open(path) as f:
        txt = f.read().strip()
    # archived driver files may hold one JSON line among log noise
    for line in reversed(txt.splitlines()):
        line = line.strip()
        i = line.find("{")
        if i >= 0 and line.endswith("}"):
            try:
                return json.loads(line[i:])
            except json.JSONDecodeError:
                continue
    raise SystemExit(f"{path}: no JSON object found")


def families(doc):
    if "layouts" in doc:  # bench_out.json: full per-layout seconds
        fam = {}
        for name, sec in doc["layouts"].items():
            fam[name.split("_")[0]] = fam.get(name.split("_")[0], 0.0) + sec
        return fam
    if "layout_ds" in doc:  # final line: per-family deciseconds
        return {k: v / 10.0 for k, v in doc["layout_ds"].items()}
    return {}


def main():
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    for path in sys.argv[1:]:
        doc = load(path)
        total = float(doc.get("value", 0.0))
        layout = float(doc.get("layout_build_sec", 0.0))
        fam = families(doc)
        print(f"{path}: total={total:.1f}s layout_build={layout:.1f}s "
              f"warm-equivalent={total - layout:.1f}s")
        for f, sec in sorted(fam.items()):
            print(f"  {f:>6}: {sec:6.1f}s")
        if fam and abs(sum(fam.values()) - layout) > max(0.5, 0.05 * layout):
            print(f"  WARNING: family sum {sum(fam.values()):.1f}s != "
                  f"layout_build_sec {layout:.1f}s")


if __name__ == "__main__":
    main()
