"""Stage-level scaling profile of the flagship extraction job.

The --scaling sweep gives ONE number (job efficiency 8→32). This probe
decomposes the job into its physical stages and measures each stage's
own 8→32 scaling, so the below-ceiling loss (VERDICT r3: 0.709 raw vs
0.902 bare-kernel ceiling) can be attributed instead of guessed at:

  jvm_scan    parquet scan + size(spans) — pure JVM columnar read
  jvm_text    scan + concat_ws over spans.text — JVM read incl. all
              text bytes (codegen, no Python)
  noop_py     scan → mapInArrow(identity) → size — the Arrow IPC
              round-trip with zero kernel compute
  py_read     scan → mapInArrow that consumes each batch and returns
              only its row count — the JVM→Python leg alone, isolating
              which direction of the IPC round-trip stops scaling
  pass1       repeating_heading_set (scan → Python candidates →
              groupBy → TakeOrdered collect)
  pass2       extract with a precomputed empty heading set (scan →
              Python kernel, no shuffle)
  full        extract() end-to-end (pass1 + pass2)

Each (stage, cores) probe is a fresh subprocess (own JVM, own warmup,
best-of-2 timed), interleaved across rounds like bench.py --scaling.

Usage:
  python scripts/profile_scaling_stages.py [--levels 8,32] [--rounds 2]
      [--stages jvm_scan,noop_py,...] [--docs /tmp/bench_docs_2400000]
      [--conf spark.foo=bar ...]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

STAGES = ["jvm_scan", "jvm_text", "noop_py", "py_read", "pass1", "pass2", "full"]


def _probe(stage: str, cores: int, docs_path: str, confs: dict[str, str]) -> float:
    from pyspark.sql import functions as F

    from barks_ocr_spark.operators import extraction
    from barks_ocr_spark.session import get_spark

    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{max(4, round(cores * 0.75))}g")
    spark = get_spark(
        f"profile-{stage}-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf=confs or None,
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(docs_path)

    def run() -> None:
        if stage == "jvm_scan":
            docs.select(F.sum(F.size("spans"))).collect()
        elif stage == "jvm_text":
            docs.select(
                F.sum(F.length(F.concat_ws("", F.col("spans.text"))))
            ).collect()
        elif stage == "noop_py":
            import pyarrow as pa

            def _ident(batches):
                yield from batches

            narrow = docs.select("doc_id", "spans")
            narrow.mapInArrow(_ident, narrow.schema).select(
                F.sum(F.size("spans"))
            ).collect()
        elif stage == "py_read":
            import pyarrow as pa

            def _counts(batches):
                for b in batches:
                    yield pa.RecordBatch.from_arrays(
                        [pa.array([b.num_rows], type=pa.int64())], ["n"]
                    )

            narrow = docs.select("doc_id", "spans")
            narrow.mapInArrow(_counts, "n long").select(F.sum("n")).collect()
        elif stage == "pass1":
            extraction.repeating_heading_set(docs)
        elif stage == "pass2":
            extraction.extract(docs, repeating=frozenset()).select(
                F.sum(F.size("spans"))
            ).collect()
        elif stage == "full":
            extraction.extract(docs).select(F.sum(F.size("spans"))).collect()
        else:  # pragma: no cover
            raise ValueError(stage)

    run()  # warmup: JIT + Arrow init + python worker spawn
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    spark.stop()
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="8,32")
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--stages", default=",".join(STAGES))
    ap.add_argument("--docs", default="/tmp/bench_docs_2400000")
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--probe", nargs=2, metavar=("STAGE", "CORES"), default=None)
    args = ap.parse_args()
    confs = dict(c.split("=", 1) for c in args.conf)

    if args.probe:
        stage, cores = args.probe[0], int(args.probe[1])
        wall = _probe(stage, cores, args.docs, confs)
        print(json.dumps({"stage": stage, "cores": cores, "wall": round(wall, 3)}))
        return

    levels = [int(c) for c in args.levels.split(",")]
    stages = args.stages.split(",")
    walls: dict[tuple[str, int], list[float]] = {}
    for _ in range(args.rounds):
        for cores in levels:
            for stage in stages:
                cmd = [
                    sys.executable, __file__,
                    "--probe", stage, str(cores),
                    "--docs", args.docs,
                ]
                for c in args.conf:
                    cmd += ["--conf", c]
                out = subprocess.run(cmd, capture_output=True, text=True, check=True)
                w = json.loads(out.stdout.strip().splitlines()[-1])["wall"]
                walls.setdefault((stage, cores), []).append(w)
                print(
                    json.dumps({"stage": stage, "cores": cores, "wall": w}),
                    flush=True,
                )
    lo, hi = levels[0], levels[-1]
    ratio = hi / lo
    print(f"\n{'stage':<10} {'t' + str(lo):>8} {'t' + str(hi):>8} {'eff':>6}")
    for stage in stages:
        a = min(walls[(stage, lo)])
        b = min(walls[(stage, hi)])
        eff = (a / b) / ratio
        print(f"{stage:<10} {a:>8.2f} {b:>8.2f} {eff:>6.3f}")


if __name__ == "__main__":
    main()
