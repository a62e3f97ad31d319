#!/usr/bin/env python
"""Physical-plan review: print .explain('formatted') for the headline
queries and grep the properties that matter at scale (pushed filters,
broadcast vs SMJ choices, WholeStageCodegen spans, exchanges). Output is
pasted into PLANS.md with commentary."""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from osmcoastline_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as em

    names = sys.argv[2:] or [
        "q_filter_ways",
        "q_semi_join",
        "q_segments_normalize",
        "q_location_join",
        "q_dedup_exact",
        "q_embedding_topk",
    ]
    qs = em.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        p = plan_of(df)
        print(f"\n{'=' * 70}\n{name}\n{'=' * 70}")
        print(p)
        # quick scorecard
        print(">>> exchanges:", p.count("Exchange"))
        print(">>> codegen spans:", p.count("WholeStageCodegen"))
        print(">>> broadcast joins:", p.count("BroadcastHashJoin"))
        print(">>> sort-merge joins:", p.count("SortMergeJoin"))
        print(">>> pushed filters:", "yes" if "PushedFilters: [" in p and "PushedFilters: []" not in p else "none")
    spark.stop()


if __name__ == "__main__":
    main()
