#!/usr/bin/env python3
"""Scaling-experiment fixture: copy a testdata dir into N part files
per table (same rows, same order) so parquet scans can parallelize.

Round-18 verdict item 4 asked whether the sf0.1 8-vs-32-core scaling
ceiling was the single-row-group layout's fault. /root/testdata is
driver-owned (read-only mounts; mutating it would also pollute the
round-over-round bench comparison), so the sweep runs on a copy:

    python3 tools/rowgroup_copy.py /root/testdata/sf0.1 /tmp/sf01_rg8 8
    SPARK_GRAFT_SF_DIR=/tmp/sf01_rg8 SPARK_GRAFT_CPUS=32 ... graft.Bench
    SPARK_GRAFT_SF_DIR=/tmp/sf01_rg8 SPARK_GRAFT_CPUS=8  ... graft.Bench

Result (r18, top-20 suite, 3 passes): 18/20 queries remained FASTER at
8 cores than 32 even with 8-way scans available — per-stage fixed cost
dominates sub-15 MB inputs regardless of split count, so the sf0.1
core ratio measures harness physics, not the engine (OPTIMIZATION_r18
§6). Each <table>.parquet becomes a DIRECTORY of part files, which
both Spark and DuckDB's read_parquet('<dir>/*.parquet') accept.
"""
import math
import os
import sys

import pyarrow.parquet as pq


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    parts = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(dst, exist_ok=True)
    for f in sorted(os.listdir(src)):
        t = pq.read_table(os.path.join(src, f))
        n = t.num_rows
        k = parts if n >= parts else 1
        d = os.path.join(dst, f)
        os.makedirs(d, exist_ok=True)
        step = math.ceil(n / k)
        for i in range(k):
            sl = t.slice(i * step, step)
            if sl.num_rows:
                pq.write_table(sl, os.path.join(d, f"part-{i:02d}.parquet"))
        print(f, n, "rows ->", k, "files")


if __name__ == "__main__":
    main()
