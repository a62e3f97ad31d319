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

__all__ = [
    "hll_register_exprs",
    "hll_estimate_expr",
    "hll_sketch",
    "hll_merge",
    "hll_cardinality",
    "kmv_sketch",
    "kmv_merge",
    "kmv_cardinality",
    "kmv_overlap",
    "cms_sketch",
    "cms_merge",
    "cms_estimate",
    "bloom_build",
    "bloom_merge",
    "bloom_prune",
    "sample_sketch",
    "sample_quantiles",
    "QUANTILES",
    "SAMPLE_SPACE",
    "RHO_CAP",
    "KMV_SPACE",
]

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


def hll_register_exprs(value_col: str, p: int) -> tuple[Column, Column]:
    """(bucket, rho) register projection for one value — the plan-side md5
    arithmetic shared by the batch sketch and the streaming twin
    (streaming.events.stream_hll_distinct), so both produce identical
    registers for identical values and their estimates agree bit-for-bit."""
    if not 1 <= p <= 12:
        raise ValueError(f"p must be in 1..12, got {p}")
    hexh = F.md5(F.col(value_col).cast("string"))
    bucket = F.shiftright(
        F.conv(F.substring(hexh, 1, 3), 16, 10).cast("long"), 12 - p
    )
    return bucket, _rho_expr(hexh)


def hll_estimate_expr(p: int) -> Column:
    """Raw harmonic-mean estimate from exact int64 columns ``_sp`` (sum of
    2^(RHO_CAP − reg) over present registers) and ``zero_regs`` — the ONE
    IEEE division shared by hll_cardinality and the streaming twin."""
    m = 1 << p
    scale = 1 << RHO_CAP
    return F.expr(
        f"cast('{_numerator(m)!r}' as double)"
        f" / cast(_sp + zero_regs * {scale}L as double)"
    )


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
    bucket, rho = hll_register_exprs(value_col, p)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            bucket.alias("bucket"),
            rho.alias("rho"),
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
    sp = F.sum(F.expr(f"shiftleft(1L, cast({RHO_CAP} - reg as int))"))
    out = (
        sketch.groupBy(*group_cols)
        .agg(sp.alias("_sp"), (F.lit(m) - F.count(F.lit(1))).alias("zero_regs"))
        .withColumn("est_raw", hll_estimate_expr(p))
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


# --------------------------------------------------------------------------
# KMV (k minimum values) — bottom-k distinct sketch
# --------------------------------------------------------------------------

KMV_SPACE = 1 << 60  # md5 60-bit hash space (15 hex digits)


def _kmv_hash(value_col: str) -> Column:
    """60-bit integer from the first 15 md5 hex digits — exact in any
    engine (15 hex digits fit a signed int64), same canonical-string
    hashing as the HLL side."""
    return F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Per-group bottom-k distinct sketch: (group..., h, v) — the k
    SMALLEST distinct 60-bit hashes with a witness value each.

    Unlike HLL this keeps actual values, so the sketch doubles as a
    uniform sample of the DISTINCT values per group (the hash is uniform
    and value-determined, so the bottom-k is a simple random sample of
    the distinct set — duplicates get no extra weight).  Bottom-k is
    exact algebra, so the whole pipeline is deterministic and the merge
    is exact: bottom-k of a union equals bottom-k of the per-part
    bottom-k's.

    Plan: ONE Arrow partial aggregation (mapInPandas keeps the k
    smallest per group per PARTITION — bounded output, groups·k rows per
    task, the sketch-combine shape Spark's own approx aggs use JVM-side)
    then one groupBy exchange over those candidates (≤ tasks·k rows per
    group), window bottom-k.  The corpus itself is never shuffled.

    Witness tie-break: per hash, the MIN value string — md5 collisions
    inside 2^60 are vanishing, but the tie-break keeps the output
    deterministic even then."""
    import pandas as pd

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql.window import Window

    src = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            _kmv_hash(value_col).alias("h"),
            F.col(value_col).cast("string").alias("v"),
        )
    )
    gcols = list(group_cols)

    def partial(batches):
        best: dict = {}  # group key -> {h: min v}
        for pdf in batches:
            for key, sub in pdf.groupby(gcols, sort=False, dropna=False):
                kk = key if isinstance(key, tuple) else (key,)
                cur = best.setdefault(kk, {})
                # per-hash min witness, then keep the k smallest hashes
                agg = sub.groupby("h", sort=False)["v"].min()
                for h, v in agg.items():
                    old = cur.get(h)
                    if old is None or v < old:
                        cur[h] = v
                if len(cur) > 4 * k:  # bound memory between batches
                    for h in sorted(cur)[k:]:
                        del cur[h]
        rows = []
        for kk, cur in best.items():
            for h in sorted(cur)[:k]:
                rows.append((*kk, h, cur[h]))
        if rows:
            yield pd.DataFrame(rows, columns=[*gcols, "h", "v"])

    schema = ", ".join(
        [f"`{c}` {t}" for c, t in src.select(*gcols).dtypes]
        + ["h long", "v string"]
    )
    cand = src.mapInPandas(partial, schema)
    w = Window.partitionBy(*gcols).orderBy(F.asc("h"), F.asc("v"))
    return (
        cand.groupBy(*gcols, "h")
        .agg(F.min("v").alias("v"))
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(*gcols, "h", "v")
    )


def kmv_merge(k: int, *sketches: DataFrame) -> DataFrame:
    """Exact sketch union: bottom-k over the per-part bottom-k's (union,
    per-hash min witness, keep k smallest) — equals the sketch of the
    unioned inputs exactly, in any merge order."""
    from pyspark.sql.window import Window

    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    gcols = [c for c in sketches[0].columns if c not in ("h", "v")]
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    w = Window.partitionBy(*gcols).orderBy(F.asc("h"), F.asc("v"))
    return (
        u.groupBy(*gcols, "h")
        .agg(F.min("v").alias("v"))
        .withColumn("pos", F.row_number().over(w))
        .filter(F.col("pos") <= k)
        .select(*gcols, "h", "v")
    )


def kmv_cardinality(
    sketch: DataFrame, group_cols: list[str], k: int = 256
) -> DataFrame:
    """Distinct-count estimate from a bottom-k sketch:
    (group..., est, sketch_size).

    Saturated groups (sketch_size = k) use the Beyer et al. 2007
    unbiased estimator (k−1)·2^60 / h_k.  The numerator exceeds int64 but
    (k−1)·2^60 is EXACTLY representable as a double for any sane k
    (k−1 < 2^53), so it is embedded as a shared double literal and the
    one runtime division is the only FP op — the DuckDB twin matches
    bit-for-bit.  Unsaturated groups hold EVERY distinct hash, so the
    estimate is the exact distinct count."""
    agg = sketch.groupBy(*group_cols).agg(
        F.max("h").alias("_hk"), F.count(F.lit(1)).alias("sketch_size")
    )
    num = float((k - 1) * KMV_SPACE)
    est = F.when(
        F.col("sketch_size") < k,
        F.col("sketch_size").cast("double"),
    ).otherwise(
        F.expr(f"cast('{num!r}' as double) / cast(_hk as double)")
    )
    return agg.select(*group_cols, est.alias("est"), "sketch_size")


# --------------------------------------------------------------------------
# Count-min sketch — frequency estimation / heavy hitters
# --------------------------------------------------------------------------


def _cms_bucket(value: Column, depth, w: int) -> Column:
    """Bucket for one hash row: md5("<depth>:<value>") first 15 hex
    digits as int64 (non-negative, < 2^60), mod w — integer-exact in any
    engine.  ``depth`` may be a Python int or a Column."""
    dcol = depth if isinstance(depth, Column) else F.lit(int(depth))
    h = F.conv(
        F.substring(
            F.md5(F.concat(dcol.cast("string"), F.lit(":"), value)), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(int(w))


def cms_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Per-group count-min sketch: (group..., depth, bucket, cnt).

    The third sketch-family member (Cormode & Muthukrishnan 2005): HLL
    answers "how many distinct", KMV adds "which ones (a sample)", CMS
    answers "how often" — per-key frequency estimates with the one-sided
    guarantee est ≥ true and P[est > true + e·N/w] ≤ e^-d, from d·w
    int64 counters per group.  At 10^12 rows an exact per-key frequency
    table is a full shuffle of every key; the CMS state is d·w cells.

    md5-parity discipline: every cell is an exact int64 count over
    deterministic md5 buckets, so the sketch AND every estimate read off
    it carry a full value-hash DuckDB oracle — no FP anywhere.

    Plan: one narrow projection, an in-task d-way explode, then ONE
    groupBy(group, depth, bucket) exchange whose partial aggregation
    collapses each map task to ≤ d·w rows per group — model-sized
    shuffle bytes regardless of corpus size (the HLL/kmeans re-center
    shape).  Zero Python.

    NULL values are ignored (frequency of NULL is not a key)."""
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    v = F.col(value_col).cast("string")
    depth = F.explode(F.array(*[F.lit(i) for i in range(d)])).alias("depth")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, v.alias("_v"), depth)
        .select(
            *group_cols,
            "depth",
            _cms_bucket(F.col("_v"), F.col("depth"), w).alias("bucket"),
        )
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Exact sketch union: cells add.  merge-then-estimate equals
    sketch-of-the-union bit-for-bit (counts are associative/commutative
    int64 sums), so sketches compose across partitions, days, tables."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    keys = [c for c in sketches[0].columns if c != "cnt"]
    u = reduce(lambda a, b: a.unionByName(b), sketches)
    return u.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    group_cols: list[str],
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """Frequency estimates for a candidate-key frame: keys' columns plus
    ``est`` = min over the d counters each key hashes to (0 if a cell is
    absent — only possible for keys the sketch never saw).

    Plan: the sketch is model-sized (≤ groups·d·w rows), so each depth
    is a BROADCAST hash join against the keys frame — d map-side joins,
    zero exchange of the key side, est = least(...) in-row.  No explode,
    no re-aggregation."""
    out = keys
    ests = []
    for i in range(d):
        cnt_i = f"_cnt{i}"
        side = (
            sketch.filter(F.col("depth") == i)
            .withColumnRenamed("bucket", f"_b{i}")
            .select(*group_cols, f"_b{i}", F.col("cnt").alias(cnt_i))
        )
        out = out.withColumn(
            f"_b{i}", _cms_bucket(F.col(value_col).cast("string"), i, w)
        ).join(F.broadcast(side), [*group_cols, f"_b{i}"], "left")
        ests.append(F.coalesce(F.col(cnt_i), F.lit(0).cast("long")))
    est = ests[0] if d == 1 else F.least(*ests)
    return out.select(*keys.columns, est.alias("est"))


# --------------------------------------------------------------------------
# Bloom filter — membership sketch / join pruning
# --------------------------------------------------------------------------


def bloom_build(
    df: DataFrame,
    value_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Bloom filter over a key column as a frame of distinct set-bit
    positions: (bit,).  The fourth sketch-family member: HLL = how many
    distinct, KMV = which ones, CMS = how often, Bloom = is this one of
    them — the membership primitive behind build-side join pruning.

    At 10^12 probe rows the win is structural: instead of shuffling the
    probe side to meet the build keys, the build side collapses to
    ≤ min(m_bits, n·k) int64 rows that BROADCAST, and the probe side is
    filtered in place — no false negatives ever, false positives at the
    classic (1-(1-1/m)^kn)^k rate, to be re-checked by the real join if
    exactness matters (the same contract as Spark's own runtime bloom
    pruning, here as an explicit, mergeable, cross-engine-exact op).

    Hash family: the SAME md5("<i>:<value>") mod m arithmetic as the CMS
    buckets (_cms_bucket) — deterministic, integer-exact in any engine,
    so membership verdicts carry a full value-hash DuckDB oracle.

    Plan: narrow in-task k-way explode + ONE distinct exchange on bit;
    partial aggregation dedups map-side, so ≤ m_bits rows survive any
    task.  Zero Python."""
    if k < 1 or m_bits < 2:
        raise ValueError(f"need k >= 1 and m_bits >= 2, got k={k}, m_bits={m_bits}")
    v = F.col(value_col).cast("string")
    bits = F.array(*[_cms_bucket(v, i, m_bits) for i in range(k)])
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(bits).alias("bit"))
        .distinct()
    )


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Exact filter union: the set-bit union (bitwise OR in bitmap form).
    merge-then-probe equals build-on-the-union bit-for-bit, so filters
    compose across partitions, days, tables — in any order."""
    if not filters:
        raise ValueError("bloom_merge needs at least one filter")
    return reduce(lambda a, b: a.unionByName(b), filters).distinct()


def bloom_prune(
    df: DataFrame,
    bloom: DataFrame,
    value_col: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Keep the rows of ``df`` whose ``value_col`` passes the Bloom
    filter (all k bit positions set).  Never drops a true member; keeps
    a bounded-rate excess of false positives.

    Plan: k BROADCAST left joins of the model-sized bit frame against
    the probe side — the probe side is never shuffled, never exploded;
    the verdict is an in-row AND of k null-checks.  NULL keys are
    dropped (membership of NULL is not a question the sketch answers)."""
    out = df.filter(F.col(value_col).isNotNull())
    v = F.col(value_col).cast("string")
    conds = []
    for i in range(k):
        side = bloom.select(
            F.col("bit").alias(f"_b{i}"), F.lit(True).alias(f"_hit{i}")
        )
        out = out.withColumn(f"_b{i}", _cms_bucket(v, i, m_bits)).join(
            F.broadcast(side), [f"_b{i}"], "left"
        )
        conds.append(F.col(f"_hit{i}").isNotNull())
    keep = reduce(lambda a, b: a & b, conds)
    return out.filter(keep).select(*df.columns)


# --------------------------------------------------------------------------
# Deterministic-sample quantile sketch — distribution summary
# --------------------------------------------------------------------------

SAMPLE_SPACE = 1 << 16  # md5 16-bit prefix (4 hex digits)


def sample_sketch(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
    rate_hex: int = 4096,
    salt: str = "q",
) -> DataFrame:
    """Deterministic Bernoulli row sample as a distribution sketch:
    (group..., value) for rows whose md5("<salt>:<id>") 16-bit prefix
    falls below ``rate_hex`` (rate = rate_hex / 65536).  The fifth
    sketch-family member: HLL/KMV/CMS/Bloom answer distinct/sample/
    frequency/membership — this one answers "how are the values
    DISTRIBUTED" (quantiles, via sample_quantiles).

    The sample is a pure function of (salt, id, rate) — no RNG state, no
    partition order — so it is reproducible across engines, runs, and
    partitionings (the stratified_sample discipline), and it composes:
    sampling disjoint-id parts and unioning equals sampling the union
    EXACTLY (same per-row verdicts), so the sketch merges by plain
    union.  Rank error obeys DKW: sup|F̂−F| ≤ sqrt(ln(2/δ)/2n) w.p. 1−δ.

    Plan: a NARROW filter — zero shuffle, zero Python; the corpus pass
    is embarrassingly parallel and the surviving rows are rate·N."""
    if not 1 <= rate_hex <= SAMPLE_SPACE:
        raise ValueError(f"rate_hex must be in 1..{SAMPLE_SPACE}, got {rate_hex}")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            1,
            4,
        ),
        16,
        10,
    ).cast("long")
    return (
        df.filter(F.col(value_col).isNotNull() & F.col(id_col).isNotNull())
        .filter(h < rate_hex)
        .select(*group_cols, F.col(value_col).alias("value"))
    )


# default quantile lattice: label -> (numerator, denominator)
QUANTILES = {"p25": (1, 4), "p50": (1, 2), "p75": (3, 4), "p95": (19, 20)}


def sample_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    quantiles: dict[str, tuple[int, int]] | None = None,
) -> DataFrame:
    """Per-group quantiles from a sample sketch: (group..., q, est).

    The q-quantile is the order statistic at rank max(1, ceil(q·n)) —
    computed in EXACT integer arithmetic ((num·n + den − 1) div den), and
    ``est`` is a value COPIED from the sample (never arithmetic on it),
    so the readout is bit-exact cross-engine even for doubles, and
    row_number tie order among equal values cannot affect it.

    Plan: ONE exchange — the rank window and the per-group count share
    the same hash partitioning on the group key; the quantile lattice is
    an in-task explode.  Zero Python."""
    from pyspark.sql.window import Window

    qs = QUANTILES if quantiles is None else quantiles
    w = Window.partitionBy(*group_cols).orderBy(F.asc("value"))
    wn = Window.partitionBy(*group_cols)
    lattice = F.array(
        *[
            F.struct(
                F.lit(label).alias("q"),
                F.lit(num).alias("num"),
                F.lit(den).alias("den"),
            )
            for label, (num, den) in qs.items()
        ]
    )
    ranked = sketch.select(
        *group_cols,
        "value",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    return (
        ranked.withColumn("_q", F.explode(lattice))
        .filter(
            F.col("_rn")
            == F.greatest(
                F.lit(1).cast("long"),
                F.expr("(_q.num * _n + _q.den - 1) DIV _q.den"),
            )
        )
        .select(*group_cols, F.col("_q.q").alias("q"), F.col("value").alias("est"))
    )


def kmv_overlap(
    sketch: DataFrame,
    group_col: str,
    k: int = 256,
) -> DataFrame:
    """Pairwise set-overlap estimates between groups, from their bottom-k
    sketches ALONE: (g1, g2, common, basis, jaccard_est, union_est,
    inter_est) for every unordered group pair g1 < g2.

    The estimator (Beyer et al. 2007): take the k smallest hashes of the
    COMBINED sketch pair (the union's bottom-k — exact, because a union
    member that belongs to A is necessarily in A's own bottom-k), count
    how many belong to both sides (``common``) out of ``basis`` =
    min(k, candidate count); then jaccard_est = common/basis,
    union_est = the kmv_cardinality rule on the union bottom-k, and
    inter_est = jaccard_est · union_est.  When both groups are
    unsaturated the sketches ARE the distinct sets and every output is
    exact.  This answers "how much do two corpora overlap" — the
    cross-dataset contamination question — without ever touching or
    shuffling the raw values again.

    All counting is exact integer; the three estimate columns are IEEE
    divisions/multiplications of exact ints and the shared (k−1)·2^60
    double literal, in a fixed expression order the DuckDB twin mirrors
    — correctly-rounded ops, bit-identical cross-engine.

    Plan note: the input is a SKETCH (≤ groups·k rows), so the pair
    lattice, joins and windows below are model-sized by construction —
    the corpus-scale work ended when the sketch was built."""
    from pyspark.sql.window import Window

    g = F.col(group_col)
    a = sketch.select(g.alias("g1"), F.col("h"))
    b = sketch.select(g.alias("g2"), F.col("h"))
    # membership of each hash on each side of each pair: full outer join
    # per hash within the pair lattice (g1 < g2 keeps pairs unordered)
    both = (
        a.withColumn("_ina", F.lit(1))
        .join(
            b.withColumn("_inb", F.lit(1)),
            ["h"],
            "full",
        )
        .filter(F.col("g1") < F.col("g2"))
    )
    # the full join above only pairs SHARED hashes; add each side's
    # non-shared hashes against every other group via the pair lattice
    groups = sketch.select(g.alias("_g")).distinct()
    lat = (
        groups.select(F.col("_g").alias("g1"))
        .join(groups.select(F.col("_g").alias("g2")))
        .filter(F.col("g1") < F.col("g2"))
    )
    onlya = (
        lat.join(a, ["g1"])
        .join(b, ["g2", "h"], "left_anti")
        .select("g1", "g2", "h", F.lit(1).alias("_ina"), F.lit(None).cast("int").alias("_inb"))
    )
    onlyb = (
        lat.join(b, ["g2"])
        .join(a, ["g1", "h"], "left_anti")
        .select("g1", "g2", "h", F.lit(None).cast("int").alias("_ina"), F.lit(1).alias("_inb"))
    )
    shared = (
        both.filter(F.col("_ina").isNotNull() & F.col("_inb").isNotNull())
        .select("g1", "g2", "h", "_ina", "_inb")
    )
    u = shared.unionByName(onlya).unionByName(onlyb)
    w = Window.partitionBy("g1", "g2").orderBy(F.asc("h"))
    topk = u.withColumn("_pos", F.row_number().over(w)).filter(F.col("_pos") <= k)
    agg = topk.groupBy("g1", "g2").agg(
        F.sum(
            F.when(F.col("_ina").isNotNull() & F.col("_inb").isNotNull(), 1).otherwise(0)
        ).alias("common"),
        F.count(F.lit(1)).alias("basis"),
        F.max("h").alias("_hk"),
    )
    num = float((k - 1) * KMV_SPACE)
    union_est = F.when(
        F.col("basis") < k, F.col("basis").cast("double")
    ).otherwise(F.expr(f"cast('{num!r}' as double) / cast(_hk as double)"))
    jac = F.col("common").cast("double") / F.col("basis").cast("double")
    return agg.select(
        "g1",
        "g2",
        "common",
        "basis",
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        (jac * union_est).alias("inter_est"),
    )
