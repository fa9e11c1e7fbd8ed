"""Salvage a crashed curve run: parse the per-point lines a run_config
printed before dying and merge them into BENCH_curve.json.

curve.py prints every measured point as ``<config-name> {dict}`` (flush=True)
precisely so a late OOM/timeout cannot erase the evidence; this tool folds a
log back into the artifact with a ``partial: true`` marker.

Usage: python benchmarks/merge_curve_log.py <log> <config-name> <n> <d> <metric>
"""

import ast
import json
import os
import sys


def main():
    log, name, n, d, metric = sys.argv[1:6]
    points = []
    with open(log) as f:
        for line in f:
            if not line.startswith(name + " {"):
                continue
            try:
                points.append(ast.literal_eval(line[len(name) + 1 :].strip()))
            except (ValueError, SyntaxError):
                pass
    if not points:
        raise SystemExit(f"no '{name}' points in {log}")
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_curve.json",
    )
    with open(path) as f:
        out = json.load(f)
    cfg = {"config": name, "n": int(n), "d": int(d), "metric": metric,
           "batch": 256, "k": 10, "partial": True, "points": points}
    out["configs"] = [c for c in out["configs"]
                      if c.get("config") != name] + [cfg]
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"merged {len(points)} points as {name} (partial) into {path}")


if __name__ == "__main__":
    main()
