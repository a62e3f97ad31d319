"""Distributed application of a chain-merge plan.

Both ring assembly's driver-finish phase and gap closing (R2) reduce to the
same shape: a tiny plan — (ring_id → group, seq, skip_first) plus per-group
finalize actions — computed from endpoints only, applied to the coordinate
arrays distributed via groupBy(group).applyInPandas. The plan is
O(open chains); the data never leaves the executors.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RING_SCHEMA = (
    "ring_id long, node_ids array<long>, xs array<double>, ys array<double>, "
    "nways int, fixed boolean, lead long"
)


def apply_merge_plan(
    spark: SparkSession,
    open_rings: DataFrame,
    plan: list[tuple],  # (ring_id, group_id, seq, skip_first)
    finalize: list[tuple],  # (group_id, append_first, fake_close, grp_fixed)
) -> DataFrame:
    """Concatenate ring parts per group, ordered by seq; rotate rings that
    closed so they start at the min-way chain's lead node."""
    plan_df = spark.createDataFrame(
        plan, "ring_id long, group_id long, seq int, skip_first boolean"
    )
    fin_df = spark.createDataFrame(
        finalize, "group_id long, append_first boolean, fake_close boolean, grp_fixed boolean"
    )
    tagged = open_rings.join(plan_df, "ring_id").join(fin_df, "group_id")

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq")
        node_ids: list[int] = []
        xs: list[float] = []
        ys: list[float] = []
        nways = 0
        for row in pdf.itertuples(index=False):
            ids = list(row.node_ids)
            rxs = list(row.xs)
            rys = list(row.ys)
            if row.skip_first and node_ids:
                ids, rxs, rys = ids[1:], rxs[1:], rys[1:]
            node_ids.extend(ids)
            xs.extend(rxs)
            ys.extend(rys)
            nways += row.nways
        first = pdf.iloc[0]
        if first["append_first"]:
            node_ids.append(node_ids[0])
            xs.append(xs[0])
            ys.append(ys[0])
        if first["fake_close"]:
            node_ids[-1] = node_ids[0]
        fixed = bool(first["grp_fixed"]) or bool(pdf["fixed"].any())
        min_row = pdf.loc[pdf["ring_id"].idxmin()]
        lead = int(min_row["lead"])
        if node_ids and node_ids[0] == node_ids[-1] and lead in node_ids:
            p = node_ids.index(lead)
            if p > 0:
                core_i, core_x, core_y = node_ids[:-1], xs[:-1], ys[:-1]
                node_ids = core_i[p:] + core_i[:p]
                xs = core_x[p:] + core_x[:p]
                ys = core_y[p:] + core_y[:p]
                node_ids.append(node_ids[0])
                xs.append(xs[0])
                ys.append(ys[0])
        return pd.DataFrame(
            {
                "ring_id": [int(pdf["ring_id"].min())],
                "node_ids": [node_ids],
                "xs": [xs],
                "ys": [ys],
                "nways": [int(nways)],
                "fixed": [fixed],
                "lead": [lead],
            }
        )

    return tagged.groupBy("group_id").applyInPandas(merge, RING_SCHEMA)
