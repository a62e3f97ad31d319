"""Semi-structured (JSON) extraction for event streams.

Every real event pipeline carries a JSON properties blob next to the
typed columns; the engine must read fields out of it schema-on-read,
JVM-side (get_json_object — no Python), and account for malformed rows
instead of silently nulling them. Pure projection + one aggregate:
at 100 TB the JSON parse runs map-side and only (group, partials) move.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def json_field_stats(
    df: DataFrame,
    json_col: str = "props",
    field: str = "k",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group stats over one numeric JSON field: n_rows, n_vals
    (parseable + field present + numeric), n_bad (everything else —
    malformed JSON, missing field, non-numeric), sum/min/max of the
    value. Exact int64 everywhere.

    get_json_object returns NULL for malformed JSON AND for a missing
    field — both are "bad" here by design (an un-ingestable row is an
    un-ingestable row); rows with NULL json_col count as bad too.
    """
    group_cols = group_cols if group_cols is not None else ["event_type"]
    if not group_cols:
        raise ValueError("json_field_stats: group_cols must be non-empty "
                         "(global stats: add a literal group column)")
    raw = F.get_json_object(F.col(json_col), f"$.{field}")
    v = raw.try_cast("long")  # ANSI-safe: non-numeric extract -> NULL, not error
    return (
        df.select(*group_cols, v.alias("_v"))
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("_v").alias("n_vals"),
            (F.count(F.lit(1)) - F.count("_v")).alias("n_bad"),
            F.coalesce(F.sum("_v"), F.lit(0)).cast("long").alias("val_sum"),
            F.min("_v").alias("val_min"),
            F.max("_v").alias("val_max"),
        )
    )
