"""Mergeable cardinality sketches (HyperLogLog) — pure Catalyst, md5-parity.

The training-pipeline op the dedup/curation families still lacked: per-group
approximate COUNT DISTINCT whose state is a fixed-size register set that can
be re-aggregated — across partitions, across days, across tables — without
touching the raw values again.  At 10^12 rows a per-domain distinct count is
a full shuffle of the distinct keys; an HLL register set is 2^p small ints
per group, and merging two sketches is an exact max per register (NOT an
approximation on top of an approximation — merge-then-estimate equals
sketch-of-the-union bit-for-bit, pinned by test).

Public algorithm: Flajolet et al. 2007 (HyperLogLog), the same register/
harmonic-mean shape Spark's own `hll_sketch_agg` (DataSketches) implements.
This from-scratch variant exists because every arithmetic step is
cross-engine exact — the repo's md5-parity discipline — so the DuckDB twin
reproduces estimates bit-for-bit (the built-in DataSketches binary is not
SQL-replicable):

- hash: md5 of the value's canonical string — identical bytes everywhere.
- bucket: the first 3 hex digits (12 bits) right-shifted to p bits (p ≤ 12).
- rho: 1 + leading-zero BITS of hex digits 4..15 (48 bits), computed
  digit-wise (regexp strip of leading '0' digits + a 4-way CASE on the
  first nonzero digit) — integer-exact in any engine, capped at ``RHO_CAP``
  (P[rho > 40] = 2^-40; the cap keeps the harmonic sum in exact int64).
- harmonic sum: sum of 2^(RHO_CAP − reg) as int64 (each term ≤ 2^39,
  ≤ 2^12 registers ⇒ ≤ 2^52, exact), zero registers contribute 2^RHO_CAP.
- estimate: alpha_m · m² · 2^RHO_CAP / S — literals and one IEEE division,
  bit-identical across engines when the expression trees match.

Plan shape: sketch = one narrow projection + ONE groupBy(group, bucket)
exchange whose partial aggregation collapses each task to ≤ m rows per
group — model-sized shuffle bytes regardless of corpus size (the
kmeans_train re-center shape).  Estimate = a second exchange of ≤ m rows
per group.  Zero Python anywhere.

No reference analog (osmcoastline keeps exact counters, src/stats.hpp);
this extends the stats family to the approximate regime a 100 TB corpus
requires.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_sketch", "hll_merge", "hll_cardinality", "RHO_CAP"]

RHO_CAP = 40

# alpha_m bias constants (Flajolet et al. 2007, Fig. 3)
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def _numerator(m: int) -> float:
    """alpha_m · m² · 2^RHO_CAP as ONE Python double, embedded verbatim
    (shortest-roundtrip repr) in the Spark expression AND the DuckDB twin
    — a string-to-double parse is correctly rounded in both engines, so
    the single runtime division is the only FP op and it is IEEE-identical
    (the BM25 rational-form discipline, PLANS.md)."""
    return _alpha(m) * float(m) * float(m) * float(1 << RHO_CAP)


def _rho_expr(hexh: Column) -> Column:
    """1 + leading-zero bits of the 48-bit tail (hex digits 4..15), capped.

    Digit-wise so the DuckDB twin can reproduce it exactly: strip leading
    '0' hex digits, then a 4-way CASE maps the first nonzero digit to its
    in-digit leading zeros."""
    tail = F.substring(hexh, 4, 12)
    t = F.regexp_replace(tail, "^0+", "")
    d = F.conv(F.substring(t, 1, 1), 16, 10).cast("int")
    in_digit = (
        F.when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    )
    rho = F.when(t == F.lit(""), F.lit(49)).otherwise(
        (F.lit(12) - F.length(t)) * 4 + in_digit + 1
    )
    return F.least(rho, F.lit(RHO_CAP))


def hll_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 12,
) -> DataFrame:
    """Per-group HLL register set: (group..., bucket, reg).

    NULL values are ignored (COUNT DISTINCT semantics).  ``p`` ≤ 12 —
    the bucket is the md5 12-bit prefix right-shifted to p bits, the rho
    tail (hex digits 4..15) is disjoint from it at every p."""
    if not 1 <= p <= 12:
        raise ValueError(f"p must be in 1..12, got {p}")
    hexh = F.md5(F.col(value_col).cast("string"))
    bucket = F.shiftright(
        F.conv(F.substring(hexh, 1, 3), 16, 10).cast("long"), 12 - p
    )
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            bucket.alias("bucket"),
            _rho_expr(hexh).alias("rho"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Exact sketch union: max per (group..., bucket) register.

    merge-then-estimate equals sketch-of-the-union bit-for-bit — max is
    associative/commutative/idempotent, so sketches compose across
    partitions, days, or tables in any order."""
    if not sketches:
        raise ValueError("hll_merge needs at least one sketch")
    keys = [c for c in sketches[0].columns if c != "reg"]
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy(*keys).agg(F.max("reg").alias("reg"))


def hll_cardinality(
    sketch: DataFrame,
    group_cols: list[str],
    p: int = 12,
    corrected: bool = False,
) -> DataFrame:
    """Estimate from a register set: (group..., est_raw, zero_regs).

    ``est_raw`` is the raw harmonic-mean estimate — every input to the one
    IEEE division is an exact int64 or a shared literal, so the DuckDB
    twin matches bit-for-bit.  ``zero_regs`` (empty registers) is returned
    so callers can see the low-range regime.  ``corrected=True`` adds
    ``est`` with Flajolet's linear-counting switch (m·ln(m/V) when V > 0
    and est_raw ≤ 2.5m) — kept OUT of the oracle surface because ln()
    differs by 1 ULP across engines (measured, BM25 note in PLANS.md)."""
    m = 1 << p
    scale = 1 << RHO_CAP
    sp = F.sum(F.expr(f"shiftleft(1L, cast({RHO_CAP} - reg as int))"))
    out = (
        sketch.groupBy(*group_cols)
        .agg(sp.alias("_sp"), (F.lit(m) - F.count(F.lit(1))).alias("zero_regs"))
        .withColumn(
            "est_raw",
            F.expr(
                f"cast('{_numerator(m)!r}' as double)"
                f" / cast(_sp + zero_regs * {scale}L as double)"
            ),
        )
    )
    if corrected:
        low = (F.col("zero_regs") > 0) & (F.col("est_raw") <= 2.5 * m)
        out = out.withColumn(
            "est",
            F.when(
                low, m * F.log(F.lit(float(m)) / F.col("zero_regs"))
            ).otherwise(F.col("est_raw")),
        )
    return out.select(*group_cols, "est_raw", "zero_regs", *(
        ["est"] if corrected else []
    ))
