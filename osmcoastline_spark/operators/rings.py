"""R1 — ring assembly as a distributed fixpoint (reference:
src/coastline_ring_collection.cpp:51-118).

The reference chains ways sequentially through two endpoint hash maps. The
equivalent parallel formulation: ways are nodes of a functional graph with an
edge a→b when a.last_node_id == b.first_node_id; rings are the cycles /
chains of that graph. We contract the graph with randomized-mating list
contraction:

  round k: self-join open chains on (last_node == first_node);
           a pair (a,b) merges iff coin_k(a)=0 and coin_k(b)=1, where coin_k
           is a deterministic per-round hash — so ~1/4 of adjacent pairs
           merge per round and no chain participates in two merges at once;
           expected O(log n) rounds, each one equi-join shuffle on endpoint.

Ring id propagation = min(way_id) (reference coastline_ring.hpp:140-144).
Closed ways skip the loop entirely (F4 fast path,
coastline_ring_collection.hpp:82-87). Arrays ride through the shuffles; only
open chains (a tiny, shrinking set at real data quality) re-shuffle.

At 100 TB scale: the loop state is proportional to the number of *open*
chains, not rows; every round localCheckpoints to truncate lineage (the
Iceberg-snapshot-per-round checkpoint in production — see sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def _closed():
    return F.element_at("node_ids", 1) == F.element_at("node_ids", -1)


def _with_endpoints(df: DataFrame) -> DataFrame:
    return df.withColumn("first_node", F.element_at("node_ids", 1)).withColumn(
        "last_node", F.element_at("node_ids", -1)
    )


def _init_chains(ways_loc: DataFrame) -> DataFrame:
    return ways_loc.select(
        F.col("way_id").alias("ring_id"),
        "node_ids",
        "xs",
        "ys",
        F.lit(1).alias("nways"),
        F.lit(False).alias("fixed"),
    )


def assemble_rings(
    ways_loc: DataFrame, max_rounds: int = 64, checkpoint_every: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Returns (closed_rings, open_rings) with schema
    ring_id, node_ids, xs, ys, nways, fixed."""
    spark = ways_loc.sparkSession
    chains = _init_chains(ways_loc)
    closed = chains.filter(_closed())
    open_ = chains.filter(~_closed()).localCheckpoint(eager=True)

    cols = ["ring_id", "node_ids", "xs", "ys", "nways", "fixed"]

    for rnd in range(max_rounds):
        if open_.isEmpty():
            break
        a = _with_endpoints(open_).select(*cols, "first_node", "last_node")
        coin = F.pmod(F.xxhash64(F.col("ring_id"), F.lit(rnd)), F.lit(2))
        heads = a.filter(coin == 0).select(
            *[F.col(c).alias(f"a_{c}") for c in cols], F.col("last_node").alias("a_last")
        )
        tails = a.filter(coin == 1).select(
            *[F.col(c).alias(f"b_{c}") for c in cols], F.col("first_node").alias("b_first")
        )
        pairs = heads.join(tails, heads.a_last == tails.b_first).filter(
            F.col("a_ring_id") != F.col("b_ring_id")
        )
        # Valid coastline data has unique endpoint ids; guard against bad
        # data producing multi-matches: keep a deterministic min partner.
        pairs = (
            pairs.withColumn(
                "rk", F.row_number().over(Window.partitionBy("a_ring_id").orderBy("b_ring_id"))
            )
            .filter(F.col("rk") == 1)
            .withColumn(
                "rk2", F.row_number().over(Window.partitionBy("b_ring_id").orderBy("a_ring_id"))
            )
            .filter(F.col("rk2") == 1)
        )
        if pairs.isEmpty():
            # no mergeable pair this round; if no pair exists at all we are done
            any_pair = (
                _with_endpoints(open_)
                .alias("x")
                .join(
                    _with_endpoints(open_).alias("y"),
                    (F.col("x.last_node") == F.col("y.first_node"))
                    & (F.col("x.ring_id") != F.col("y.ring_id")),
                    "left_semi",
                )
            )
            if any_pair.isEmpty():
                break
            continue

        merged = pairs.select(
            F.least("a_ring_id", "b_ring_id").alias("ring_id"),
            F.concat(
                F.col("a_node_ids"),
                F.slice(F.col("b_node_ids"), 2, F.greatest(F.size("b_node_ids") - 1, F.lit(0))),
            ).alias("node_ids"),
            F.concat(
                F.col("a_xs"), F.slice(F.col("b_xs"), 2, F.greatest(F.size("b_xs") - 1, F.lit(0)))
            ).alias("xs"),
            F.concat(
                F.col("a_ys"), F.slice(F.col("b_ys"), 2, F.greatest(F.size("b_ys") - 1, F.lit(0)))
            ).alias("ys"),
            (F.col("a_nways") + F.col("b_nways")).alias("nways"),
            (F.col("a_fixed") | F.col("b_fixed")).alias("fixed"),
        )
        consumed = pairs.select(F.col("a_ring_id").alias("ring_id")).unionAll(
            pairs.select(F.col("b_ring_id").alias("ring_id"))
        )
        open_ = (
            open_.join(consumed, "ring_id", "left_anti").select(*cols).unionByName(merged)
        )
        if (rnd + 1) % checkpoint_every == 0:
            open_ = open_.localCheckpoint(eager=True)
        newly_closed = open_.filter(_closed())
        closed = closed.unionByName(newly_closed)
        open_ = open_.filter(~_closed())

    closed = closed.localCheckpoint(eager=True)
    open_ = open_.localCheckpoint(eager=True)
    return closed, open_


def route_rings(closed: DataFrame) -> dict[str, DataFrame]:
    """F5 size routing (reference coastline_ring_collection.cpp:176-194):
    npoints>3 ⇒ polygon candidates; ==1 ⇒ single_point_in_ring error point;
    2..3 ⇒ not_a_ring error line+points."""
    with_np = closed.withColumn("npoints", F.size("node_ids"))
    return {
        "polygonizable": with_np.filter(F.col("npoints") > 3),
        "single_point": with_np.filter(F.col("npoints") == 1),
        "not_a_ring": with_np.filter((F.col("npoints") >= 2) & (F.col("npoints") <= 3)),
    }
