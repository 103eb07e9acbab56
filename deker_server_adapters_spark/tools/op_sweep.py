"""Time every registry op (build + count) at a given SF — the r17
optimization round's ranking sweep. One warmup + min of N timed passes
per op, bench-protocol style; writes one JSON object to stdout.

    python -m deker_server_adapters_spark.tools.op_sweep [--sf-dir D] [--passes N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--only", default=None, help="comma-separated subset")
    args = ap.parse_args()

    from deker_server_adapters_spark.operators import all_ops
    from deker_server_adapters_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="deker-op-sweep", shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    ops = all_ops()
    names = args.only.split(",") if args.only else list(ops)
    out: dict[str, float] = {}
    for name in names:
        op = ops[name]
        try:
            spark.sparkContext.setJobDescription(f"sweep:{name}")
            op.builder(spark, args.sf_dir).count()  # warmup (codegen)
            samples = []
            for _ in range(args.passes):
                t0 = time.perf_counter()
                op.builder(spark, args.sf_dir).count()
                samples.append(time.perf_counter() - t0)
            out[name] = round(min(samples), 3)
            print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
        except Exception:
            out[name] = -1.0
            traceback.print_exc(file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": args.sf_dir, "passes": args.passes, "sec": out}))


if __name__ == "__main__":
    main()
