"""A/B: repetition_scores kernel (zero-shuffle pandas_udf) vs the
relational formulation (explode + three keyed aggregates), same rows,
same session — the receipt for preferring the kernel form (VERDICT r4
"What's wrong" 4).

Usage: python scripts/ab_repetition.py [sf_dir] [cpus]
Prints one JSON line with best-of-2 walls for each form and the ratio.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from barks_ocr_spark.operators import textstats  # noqa: E402
from barks_ocr_spark.plans.queries import load  # noqa: E402
from barks_ocr_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark(
        "ab-repetition", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    docs.count()  # warm scan

    def best_of_2(fn) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(docs).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    kernel = best_of_2(textstats.repetition_scores)
    relational = best_of_2(textstats.repetition_scores_relational)
    spark.stop()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "cpus": cpus,
                "kernel_sec": kernel,
                "relational_sec": relational,
                "relational_over_kernel": round(relational / kernel, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
