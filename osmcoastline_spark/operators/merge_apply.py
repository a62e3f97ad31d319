"""Distributed application of a chain-merge plan.

Ring assembly's mating rounds, its driver-finish phase, and gap closing (R2)
all reduce to the same shape: a merge plan — (ring_id → group, seq, seq2,
skip_first) plus per-group finalize actions — computed from ENDPOINTS only,
applied to the coordinate arrays in ONE groupBy(group).applyInPandas pass.
The plan is O(open chains); the arrays never ride an iterative shuffle.

`seq`/`seq2` order parts within a group lexicographically: `seq` is the
outer position assigned by the planner (driver chain order), `seq2` the
inner position for chains that were pre-merged during the distributed
mating rounds (member order within the pre-merged chain).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

RING_SCHEMA = (
    "ring_id long, node_ids array<long>, xs array<double>, ys array<double>, "
    "nways int, fixed boolean, lead long"
)

PLAN_SCHEMA = "ring_id long, group_id long, seq int, seq2 int, skip_first boolean"
FIN_SCHEMA = "group_id long, append_first boolean, fake_close boolean, grp_fixed boolean"


def apply_merge_plan(
    spark: SparkSession,
    open_rings: DataFrame,
    plan: list[tuple],  # (ring_id, group_id, seq, skip_first)
    finalize: list[tuple],  # (group_id, append_first, fake_close, grp_fixed)
) -> DataFrame:
    """List-based wrapper (driver-computed plans: gap closing, small-input
    assembly finish). The plan is tiny — both joins broadcast."""
    plan_df = spark.createDataFrame(
        [(r, g, s, 0, sk) for r, g, s, sk in plan], PLAN_SCHEMA
    )
    fin_df = spark.createDataFrame(finalize, FIN_SCHEMA)
    return apply_merge_plan_df(open_rings, plan_df, fin_df, broadcast_plan=True)


def apply_merge_plan_df(
    open_rings: DataFrame,
    plan_df: DataFrame,  # PLAN_SCHEMA columns
    fin_df: DataFrame,  # FIN_SCHEMA columns
    broadcast_plan: bool = False,
) -> DataFrame:
    """Concatenate ring parts per group, ordered by (seq, seq2); rotate rings
    that closed so they start at the min-way chain's lead node."""
    from pyspark.sql import functions as F

    if broadcast_plan:
        plan_df = F.broadcast(plan_df)
        fin_df = F.broadcast(fin_df)
    else:
        # plan rows ∝ open chains — usually broadcastable, but NEVER risk
        # the planner flipping the join and broadcasting the coordinate-
        # array side (its post-checkpoint size statistics are unreliable;
        # observed driver OOM at 1.6M islands). Force a shuffle hash join.
        plan_df = plan_df.hint("shuffle_hash")
        fin_df = fin_df.hint("shuffle_hash")
    # One shuffle: the groupBy(group_id). Aggregate parts per group JVM-side,
    # then run ONE Arrow batch over the aggregated rows (per-group
    # applyInPandas pays a pandas-DataFrame construction per group, which
    # dominates when groups are small and AQE has coalesced the shuffle).
    tagged = open_rings.join(plan_df, "ring_id").join(fin_df, "group_id")
    agg = tagged.groupBy("group_id", "append_first", "fake_close", "grp_fixed").agg(
        F.sort_array(
            F.collect_list(
                F.struct("seq", "seq2", "skip_first", "node_ids", "xs", "ys",
                         "nways", "fixed", "ring_id", "lead")
            )
        ).alias("parts")
    )

    def merge_batch(it):
        for pdf in it:
            out = {k: [] for k in ("ring_id", "node_ids", "xs", "ys", "nways", "fixed", "lead")}
            for row in pdf.itertuples(index=False):
                node_ids: list[int] = []
                xs: list[float] = []
                ys: list[float] = []
                nways = 0
                fixed = bool(row.grp_fixed)
                min_rid = None
                lead = None
                for part in row.parts:
                    ids = list(part["node_ids"])
                    rxs = list(part["xs"])
                    rys = list(part["ys"])
                    if part["skip_first"] and node_ids:
                        ids, rxs, rys = ids[1:], rxs[1:], rys[1:]
                    node_ids.extend(ids)
                    xs.extend(rxs)
                    ys.extend(rys)
                    nways += part["nways"]
                    fixed = fixed or bool(part["fixed"])
                    if min_rid is None or part["ring_id"] < min_rid:
                        min_rid = part["ring_id"]
                        lead = part["lead"]
                if row.append_first:
                    node_ids.append(node_ids[0])
                    xs.append(xs[0])
                    ys.append(ys[0])
                if row.fake_close:
                    node_ids[-1] = node_ids[0]
                # Rotation is only safe when the ring is closed in
                # COORDINATES too: fake_close aliases the last node id while
                # its location stays distinct (reference fake_close,
                # src/coastline_ring.cpp) — rotating such a ring would drop
                # the real last vertex. Skip it; the gap geometry survives.
                coord_closed = (
                    node_ids
                    and node_ids[0] == node_ids[-1]
                    and not row.fake_close
                    and xs[0] == xs[-1]
                    and ys[0] == ys[-1]
                )
                if coord_closed and lead in node_ids:
                    p = node_ids.index(lead)
                    if p > 0:
                        core_i, core_x, core_y = node_ids[:-1], xs[:-1], ys[:-1]
                        node_ids = core_i[p:] + core_i[:p]
                        xs = core_x[p:] + core_x[:p]
                        ys = core_y[p:] + core_y[:p]
                        node_ids.append(node_ids[0])
                        xs.append(xs[0])
                        ys.append(ys[0])
                out["ring_id"].append(int(min_rid))
                out["node_ids"].append(node_ids)
                out["xs"].append(xs)
                out["ys"].append(ys)
                out["nways"].append(int(nways))
                out["fixed"].append(fixed)
                out["lead"].append(int(lead))
            yield pd.DataFrame(out)

    return agg.mapInPandas(merge_batch, RING_SCHEMA)
