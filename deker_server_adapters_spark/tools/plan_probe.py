"""Capture ``explain("formatted")`` and noop-sink timings per operator.

Usage:

    python -m deker_server_adapters_spark.tools.plan_probe \
        [--ops q1_pricing_summary,dedup_simhash | --headline] \
        [--outdir plans/r17 --suffix _before] [--time N] [--sf-dir DIR]

For every selected op this writes ``<outdir>/<name><suffix>.txt`` with
the formatted physical plan and, with ``--time N``, N noop-sink
executions (guide §1.4: the noop write computes every column of every
row, so the timing excludes driver-side row materialization but not
any real work). One warmup pass precedes the timed passes so codegen
compilation is excluded, matching bench.py's protocol. Timings print
to stdout as one JSON line per op.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import time
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default=None, help="comma-separated op names")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--time", type=int, default=0, help="timed noop passes")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from deker_server_adapters_spark.operators import all_ops
    from deker_server_adapters_spark.session import get_spark

    ops = all_ops()
    if args.ops:
        names = [n.strip() for n in args.ops.split(",") if n.strip()]
    elif args.headline:
        names = [n for n, op in ops.items() if op.headline]
    else:
        ap.error("pass --ops or --headline")
        return
    unknown = [n for n in names if n not in ops]
    if unknown:
        raise SystemExit(f"unknown ops: {unknown}")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="deker-plan-probe", shuffle_partitions=max(cpus, 32))
    spark.sparkContext.setLogLevel("ERROR")

    outdir = Path(args.outdir) if args.outdir else None
    if outdir:
        outdir.mkdir(parents=True, exist_ok=True)

    for name in names:
        op = ops[name]
        df = op.builder(spark, args.sf_dir)
        if outdir:
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (outdir / f"{name}{args.suffix}.txt").write_text(buf.getvalue())
        if args.time:
            spark.sparkContext.setJobDescription(f"probe:{name}:warmup")
            op.builder(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for i in range(args.time):
                spark.sparkContext.setJobDescription(f"probe:{name}:pass{i}")
                t0 = time.perf_counter()
                op.builder(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
                samples.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            print(json.dumps({"op": name, "noop_sec_min": min(samples), "samples": samples}), flush=True)


if __name__ == "__main__":
    main()
