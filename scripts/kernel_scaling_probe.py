"""Hardware-ceiling probe: the extraction kernel WITHOUT Spark.

Runs the Arrow extraction kernel (kernels/arrowspans.py) in K isolated
OS processes — no JVM, no shuffle, no Arrow IPC — and reports total and
per-process throughput at each parallelism level. This bounds what ANY
job on this box can achieve when scaling cores: if per-process kernel
throughput itself degrades from 8 to 32 processes, that loss is shared
hardware (DRAM bandwidth / SMT / host neighbors), not engine design.

Usage: python scripts/kernel_scaling_probe.py [levels, default 2,8,32]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# bench.py headline mode runs a single short probe as its host-speed
# normalizer; the full --scaling sweep uses the default 12 s
PROBE_SECONDS = float(os.environ.get("SPARK_GRAFT_KERNEL_PROBE_SECONDS", "12"))
DOCS_PER_BATCH = 5000


def _worker(n_sec: float, out_q, seed: int) -> None:
    import pyarrow as pa

    from barks_ocr_spark.datagen import docs as dg
    from barks_ocr_spark.kernels import arrowspans as ak
    from barks_ocr_spark.kernels import spans as pk

    pdf = dg.gen_documents(DOCS_PER_BATCH, seed=seed)
    rep = pk.repeating_headings_from_flat(pk.flatten(pdf))
    batch = pa.RecordBatch.from_pandas(
        pdf[["doc_id", "spans"]], schema=ak.BATCH_ARROW_SCHEMA, preserve_index=False
    )
    ak.extract_batch(batch, rep)  # warmup (imports, JIT-ish caches)
    t_end = time.perf_counter() + n_sec
    n = 0
    while time.perf_counter() < t_end:
        ak.extract_batch(batch, rep)
        n += DOCS_PER_BATCH
    out_q.put(n)


def main() -> None:
    levels = [int(c) for c in (sys.argv[1] if len(sys.argv) > 1 else "2,8,32").split(",")]
    results = {}
    for procs in levels:
        q: mp.Queue = mp.Queue()
        ps = [
            mp.Process(target=_worker, args=(PROBE_SECONDS, q, i))
            for i in range(procs)
        ]
        for p in ps:
            p.start()
        total = sum(q.get() for _ in ps)
        for p in ps:
            p.join()
        results[procs] = {
            "docs_per_sec": round(total / PROBE_SECONDS),
            "per_proc": round(total / PROBE_SECONDS / procs),
        }
        print(json.dumps({"procs": procs, **results[procs]}), flush=True)
    lo, hi = levels[0], levels[-1]
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "pure_kernel_scaling_efficiency",
                "window": f"{lo}->{hi}",
                "value": round(eff, 3),
            }
        )
    )


if __name__ == "__main__":
    mp.set_start_method("fork")
    main()
