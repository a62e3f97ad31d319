"""Distributed BPE tokenizer training + tokenization (Sennrich et al. 2016).

The canonical tokenizer-training loop over a corpus: seed every word as a
separator-joined character sequence, then repeatedly (1) count adjacent
symbol pairs weighted by word frequency, (2) pick the most frequent pair
with a deterministic tiebreak (count desc, then lexicographic), (3) merge
every occurrence of that pair, scanning left to right.  This is the
algorithm behind GPT-2/LLaMA-style tokenizers, here re-expressed in the
vocabulary-bounded distributed shape:

  - ONE corpus-wide shuffle builds the distinct-word frequency table
    (Heaps' law bounds it by the language — ~10M rows for a 100 TB web
    corpus — the same bounded-output argument as text.vocab_counts and
    curate.lm_familiarity).  Every training iteration thereafter touches
    only that table: the corpus is never rescanned.
  - Per merge step: one vocabulary-bounded pair-count aggregate, a
    TakeOrdered(1) for the argmax (a single-ROW collect — model size,
    not data size, the same contract as cluster.kmeans_quantized's
    k·dim centroid collects), and a pure-Catalyst merge apply.
  - The merge apply is ONE `F.replace` literal per step — JVM
    whole-stage codegen, zero Python anywhere in the training loop.

Why a single string replace is EXACTLY classic BPE (and hence fully
SQL-oracle-able for an iterative string algorithm): symbols are joined
with a TWO-space gap and the string carries single-space outer pads
(' l  o  w ').  A merge of (a, b) replaces ' a  b ' (leading space, a,
two spaces, b, trailing space) with ' ab '.  Because each match consumes
only ONE space of each boundary gap, consecutive candidate occurrences
are character-DISJOINT, so one non-overlapping left-to-right replace
pass merges precisely the greedy left-to-right occurrence set — including
self-overlapping chains ('l  l  l  l  l' -> 'll  ll  l', matching the
classic trainer), where a single-space encoding would need multiple
passes and still converge to a different (non-greedy) fixpoint.  The
replacement restores the pad/gap invariant (consumed gap space + the
replacement's boundary space = two), so the format is closed under
merging and every step is a deterministic function of the last — the
same unroll-legality argument as functions/cluster.py's Lloyd oracle.

Reference anchor: this is a training-data-pipeline operator (SURVEY.md
§2's LLM-pipeline family), not an osmcoastline port; the iterative
fixpoint-with-oracle pattern follows operators/rings.py (ring assembly
rounds) and functions/cluster.py (unrolled k-means iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Symbol separator: TWO spaces, so merge-pattern occurrences are
# character-disjoint and one LTR replace pass == the greedy BPE merge
# set (module docstring).  Symbols themselves ([a-z]+ seeds and their
# concatenations) can never contain a space.
SEP = "  "

# Word extraction regex — shared verbatim with the oracle SQL.
WORD_RE = "[a-z]+"

MERGES_SCHEMA = (
    "step int, lhs string, rhs string, merged string, pair_count long"
)


def _words(docs: DataFrame, text_col: str, id_col: str | None = None) -> DataFrame:
    """Explode documents into lowercase word instances."""
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_RE), F.lit(0)
    )
    cols = ([F.col(id_col)] if id_col else []) + [
        F.explode(toks).alias("word")
    ]
    return docs.select(*cols)


def seed_word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table with the padded seed symbol string
    (' h  e  l  l  o ').  The ONE corpus-wide shuffle of training."""
    wt = _words(docs, text_col).groupBy("word").agg(
        F.count("*").alias("freq")
    )
    sym = F.concat(
        F.lit(" "), F.array_join(F.split(F.col("word"), ""), SEP), F.lit(" ")
    )
    return wt.withColumn("sym", sym)


def _apply_merge(sym, lhs: str, rhs: str):
    """Merge every greedy-LTR occurrence of (lhs, rhs) — ONE JVM replace
    (codegen'd; no Python).  Exact by the disjoint-occurrence argument in
    the module docstring."""
    return F.replace(sym, F.lit(f" {lhs}{SEP}{rhs} "), F.lit(f" {lhs}{rhs} "))


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """(lhs, rhs, pair_count) over the current symbol strings.  The zip
    pads the shifted array with NULL (same as DuckDB list_zip), so the
    trailing (last_symbol, NULL) row is filtered — one vocabulary-bounded
    aggregate, no corpus access."""
    arr = F.split(F.trim(F.col("sym")), SEP)
    shifted = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))
    z = F.arrays_zip(arr.alias("a"), shifted.alias("b"))
    return (
        words.select("freq", F.explode(z).alias("z"))
        .filter(F.col("z.b").isNotNull())
        .groupBy(F.col("z.a").alias("lhs"), F.col("z.b").alias("rhs"))
        .agg(F.sum("freq").alias("pair_count"))
    )


def _train(
    words: DataFrame, num_merges: int
) -> tuple[list[tuple], DataFrame]:
    """Run the merge loop; return (merge rows, final word table).

    Per step: pair-count aggregate -> TakeOrdered(1) argmax collect (one
    row) -> pure-Catalyst apply.  The word table is eagerly
    localCheckpoint'ed per step (vocabulary-bounded) so no step re-runs
    prior steps' DAG — the same lazy-DAG guard functions/cluster.py
    needed for SemDeDup."""
    words = words.localCheckpoint(eager=True)
    merges: list[tuple] = []
    for step in range(1, num_merges + 1):
        top = (
            _adjacent_pairs(words)
            .orderBy(F.col("pair_count").desc(), "lhs", "rhs")
            .limit(1)
            .collect()
        )
        if not top:
            break
        r = top[0]
        merges.append((step, r.lhs, r.rhs, r.lhs + r.rhs, r.pair_count))
        words = words.withColumn(
            "sym", _apply_merge(F.col("sym"), r.lhs, r.rhs)
        ).localCheckpoint(eager=True)
    return merges, words


def bpe_train(
    docs: DataFrame, num_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Learn `num_merges` BPE merges from the corpus.

    Output: (step, lhs, rhs, merged, pair_count) — the merge table IS the
    trained tokenizer model (apply merges in step order to tokenize).
    """
    spark = docs.sparkSession
    merges, _ = _train(seed_word_table(docs, text_col), num_merges)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def bpe_token_counts(
    docs: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train on the corpus, then tokenize it: per-document word and
    BPE-token counts under the learned merges.

    Shape at 100 TB: tokenization is a BROADCAST join of the word
    instances against the vocabulary-bounded tokenized-word table plus
    one per-document aggregate — the corpus is scanned twice total
    (seed + tokenize) regardless of num_merges.  Documents with no
    words keep a 0-count row (left join), so row count == corpus size.
    """
    words0 = seed_word_table(docs, text_col)
    _, words = _train(words0, num_merges)
    wt = words.select(
        "word",
        F.size(F.split(F.trim(F.col("sym")), SEP))
        .cast("long")
        .alias("word_tokens"),
    )
    inst = _words(docs, text_col, id_col)
    per_doc = (
        inst.join(F.broadcast(wt), "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("word_tokens").alias("n_tokens"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0).cast("long")).alias(
                "n_words"
            ),
            F.coalesce(F.col("n_tokens"), F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
        )
    )


def bpe_tokenize_words(
    docs: DataFrame, num_merges: int = 8, text_col: str = "text"
) -> DataFrame:
    """Vocabulary-level tokenization: (word, freq, tokens array) under
    the merges learned from `docs` — the inspection/export surface of the
    trained model (what a tokenizer JSON dump would serialize)."""
    _, words = _train(seed_word_table(docs, text_col), num_merges)
    return words.select(
        "word", "freq", F.split(F.trim(F.col("sym")), SEP).alias("tokens")
    )
