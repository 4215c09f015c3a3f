"""Standalone reproduction of bench.py's serving CB segment (regression
hunt: v3 recorded 1.32x at 45d90a9; the last sweep measured 0.938x).

Usage: python tools/cb_repro.py [--static-only|--cb-only]
Prints the segment dict. Run from a worktree at any commit that has
bench._measure_serving_cb.
"""
import sys

sys.path.insert(0, ".")

import bench  # noqa: E402

if __name__ == "__main__":
    out = bench._measure_serving_cb()
    print(out)
