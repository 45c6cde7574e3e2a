"""Batch-preparation shapes for LLM training/inference over `documents`:
sequence packing (the concat-and-split step that turns a document stream
into fixed-size context windows) and length-bucketed padding accounting
(the dynamic-batching efficiency readout for inference). Both reduce to
exact integer arithmetic over an ordered per-shard prefix sum, so the
DuckDB oracles are value-exact.

Generalizes the reference's batch-download ledger (index.py:190-212 —
"process a list of documents, report totals") to the batching math a
training pipeline runs on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.text import tokenize, tokenize_sql
from ..tables import load_table
from .registry import query

# context-window budget (tokens per packed sequence); 512 keeps the window
# count meaningful at every test SF
_BUDGET = 512


def _shard_col(sub_shards: int):
    """The packing families' skew knob (VERDICT r6 #2): a deterministic
    hash-salt sub-shard key — pmod(xxhash64(doc_id), k) — that bounds the
    per-fold list / per-window-partition width at ~1/k of the source
    instead of the whole source (the `shuffle_shard_order` sharding
    idiom). At 100 TB a single hot source (billions of docs) is otherwise
    ONE straggler window partition / ONE executor-killing array cell; with
    the salt, each (source, sub_shard) packs independently and the report
    rolls the shards back up per source. sub_shards=1 collapses to a
    constant key — the exact single-sequence-per-source contract the
    oracles check."""
    if sub_shards <= 1:
        return F.lit(0)
    return F.pmod(F.xxhash64("doc_id"), F.lit(sub_shards))


@query(
    "context_window_packing",
    oracle=f"""
    WITH lens AS (
        SELECT doc_id, source,
               CAST(len({tokenize_sql('text')}) AS BIGINT) AS n_tok
        FROM documents
    ), cum AS (
        SELECT source, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        FROM lens
    ), marked AS (
        SELECT source, n_tok, cum,
               (cum - n_tok) // {_BUDGET} AS first_win,
               (greatest(cum, 1) - 1) // {_BUDGET} AS last_win
        FROM cum
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST((MAX(cum) + {_BUDGET} - 1) // {_BUDGET} AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN last_win > first_win THEN 1 ELSE 0 END)
                AS BIGINT) AS split_docs,
           CAST(SUM(n_tok) * 1000000
                // (greatest((MAX(cum) + {_BUDGET} - 1) // {_BUDGET}, 1)
                    * {_BUDGET})
                AS BIGINT) AS fill_e6
    FROM marked GROUP BY source ORDER BY source
    """,
)
def context_window_packing(
    spark: SparkSession, sf_dir: str, *, sub_shards: int = 1
) -> DataFrame:
    """Sequence packing by concat-and-split (the GPT-style pretraining
    batch prep): per source shard, documents are concatenated in doc_id
    order and the token stream is split every 512 tokens. Reports, per
    source: document and token volume, the packed window count, how many
    documents straddle a window boundary (they get split — the quality
    cost of this packing style vs padding), and the fill rate of the
    packed windows (the efficiency win vs padding; the only slack is the
    final partial window).

    Every number is exact int64 arithmetic over an ordered prefix sum —
    a document occupies token positions (cum - n_tok, cum], so its first
    window is (cum - n_tok) div B and its last is (cum - 1) div B
    (guarded with greatest(cum, 1) so a leading zero-token document can't
    push the dividend negative, where Spark's truncating div and DuckDB's
    flooring // disagree).

    Scale: packing is embarrassingly parallel across shards — the prefix
    sum partitions by (source, sub_shard). ``sub_shards`` is the skew
    knob (see :func:`_shard_col`): at the default 1 the shard key is the
    source alone (the oracle's contract — one packed stream per source);
    a 100 TB run raises it so no window partition is ever wider than a
    hash slice of the hottest source, and the per-source report is the
    exact rollup of its shards (each shard contributes its own partial
    final window, so n_windows can grow by at most sub_shards - 1 per
    source). One window-function pass + a two-level aggregate; nothing
    wider than a shard's doc list is ever ordered, and the output is
    dimension-sized. fill_e6's divisor is clamped to >= 1 window so an
    all-zero-token source degrades to 0, never NULL (ADVICE r6). Cites
    reference index.py:190-212 (the batch ledger this generalizes)."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(
        "doc_id",
        "source",
        _shard_col(sub_shards).alias("shard"),
        F.size(tokenize("text")).cast("bigint").alias("n_tok"),
    )
    cum = lens.withColumn(
        "cum",
        F.sum("n_tok").over(W.partitionBy("source", "shard").orderBy("doc_id")),
    )
    marked = cum.select(
        "source",
        "shard",
        "n_tok",
        "cum",
        F.expr(f"(cum - n_tok) div {_BUDGET}").alias("first_win"),
        F.expr(f"(greatest(cum, 1) - 1) div {_BUDGET}").alias("last_win"),
    )
    per_shard = marked.groupBy("source", "shard").agg(
        F.count("*").cast("bigint").alias("nd"),
        F.sum("n_tok").cast("bigint").alias("tt"),
        F.expr(f"(MAX(cum) + {_BUDGET} - 1) div {_BUDGET}")
        .cast("bigint")
        .alias("nw"),
        F.sum(F.when(F.col("last_win") > F.col("first_win"), 1).otherwise(0))
        .cast("bigint")
        .alias("sd"),
    )
    return (
        per_shard.groupBy("source")
        .agg(
            F.sum("nd").cast("bigint").alias("n_docs"),
            F.sum("tt").cast("bigint").alias("total_tokens"),
            F.sum("nw").cast("bigint").alias("n_windows"),
            F.sum("sd").cast("bigint").alias("split_docs"),
            F.expr(
                f"SUM(tt) * 1000000"
                f" div (greatest(SUM(nw), 1) * {_BUDGET})"
            )
            .cast("bigint")
            .alias("fill_e6"),
        )
        .orderBy("source")
    )


# inference-side length buckets: powers of two with a floor of 16
_BUCKET_EDGES = "greatest(16, CAST(power(2, ceil(log2(greatest(n_tok, 1)))) AS BIGINT))"


@query(
    "length_bucket_padding_report",
    oracle=f"""
    WITH lens AS (
        SELECT doc_id, CAST(len({tokenize_sql('text')}) AS BIGINT) AS n_tok
        FROM documents
    ), bucketed AS (
        SELECT n_tok, {_BUCKET_EDGES} AS bucket FROM lens
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS real_tokens,
           CAST(COUNT(*) * bucket AS BIGINT) AS padded_tokens,
           CAST(COUNT(*) * bucket - SUM(n_tok) AS BIGINT) AS wasted_tokens,
           CAST(SUM(n_tok) * 1000000 // (COUNT(*) * bucket) AS BIGINT)
               AS efficiency_e6
    FROM bucketed GROUP BY bucket ORDER BY bucket
    """,
)
def length_bucket_padding_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching efficiency (the inference-side counterpart
    of `context_window_packing`): documents are assigned to power-of-two
    length buckets (floor 16) — the standard dynamic-batching scheme where
    a batch pads every member to its bucket size — and each bucket reports
    its real vs padded token volume, the waste, and the packing
    efficiency. The readout that decides bucket granularity for a serving
    fleet: coarse buckets waste compute on padding, fine buckets starve
    batches.

    Exactness: bucket = 2^ceil(log2(n)) touches doubles only inside
    log2/power of exact small integers, where both engines are correctly
    rounded and the ceil collapses any ulp difference only at exact powers
    of two — where log2 is exact in both. All reported numbers are int64
    sums / integer division.

    Scale: one scan, one small-key groupBy (≤ ~10 buckets) with map-side
    partial aggregation — the same cost class as a count(*) by key."""
    d = load_table(spark, sf_dir, "documents")
    lens = d.select(F.size(tokenize("text")).cast("bigint").alias("n_tok"))
    bucketed = lens.select("n_tok", F.expr(_BUCKET_EDGES).alias("bucket"))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("real_tokens"),
            F.expr("COUNT(*) * bucket").cast("bigint").alias("padded_tokens"),
            F.expr("COUNT(*) * bucket - SUM(n_tok)")
            .cast("bigint")
            .alias("wasted_tokens"),
            F.expr("SUM(n_tok) * 1000000 div (COUNT(*) * bucket)")
            .cast("bigint")
            .alias("efficiency_e6"),
        )
        .orderBy("bucket")
    )


@query(
    "span_corruption_mask_stats",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, {tokenize_sql('text')} AS toks FROM documents
    ), pos AS (
        SELECT doc_id, source, CAST(i AS BIGINT) AS p, len(toks) AS n
        FROM toks, unnest(range(0, len(toks))) t(i)
    ), marked AS (
        SELECT source,
               CASE WHEN ('0x' || substr(md5(doc_id || ':' || p), 1, 15))::BIGINT
                         % 100 < 15 THEN 1 ELSE 0 END AS m,
               CASE WHEN p = 0 THEN 0
                    WHEN ('0x' || substr(md5(doc_id || ':' || (p - 1)), 1, 15))::BIGINT
                         % 100 < 15 THEN 1 ELSE 0 END AS prev_m
        FROM pos
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(SUM(m) AS BIGINT) AS masked_tokens,
           CAST(SUM(m) * 1000000 // COUNT(*) AS BIGINT) AS mask_rate_e6,
           CAST(SUM(CASE WHEN m = 1 AND prev_m = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_spans,
           CAST(CASE WHEN SUM(CASE WHEN m = 1 AND prev_m = 0 THEN 1 ELSE 0 END) = 0
                THEN 0 ELSE SUM(m) * 1000000
                     // SUM(CASE WHEN m = 1 AND prev_m = 0 THEN 1 ELSE 0 END) END
                AS BIGINT) AS avg_span_len_e6
    FROM marked GROUP BY source ORDER BY source
    """,
)
def span_corruption_mask_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-corruption masking statistics (the BERT/T5 denoising-objective
    data prep): every token position is masked iff a deterministic
    md5-derived hash of (doc_id, position) lands under 15% — reproducible
    noise, the property a distributed pipeline needs so re-runs and both
    engines corrupt identically. Contiguous masked runs form spans (T5
    replaces each span with one sentinel); reported per source: token and
    mask volume, the realized mask rate (~150000e-6 by construction), the
    span count, and mean span length.

    Plan shape: the span-start test needs the PREVIOUS position's mask
    bit — but the mask is a pure hash of (doc_id, pos), so the previous
    bit is RECOMPUTED inline instead of read through a lag window: the
    whole operator is one explode + map-side expressions + a small-key
    aggregate, no window, no second shuffle. That is the scale win of
    hash-derived noise over stored noise — at 100 TB the mask never
    materializes. Both engines share the md5->60-bit-int idiom
    (operators/dedup.py token_hash) so every bit matches exactly."""
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        "source",
        F.posexplode(tokenize("text")).alias("p", "tok"),
    ).select("doc_id", "source", F.col("p").cast("bigint").alias("p"))

    def mask_bit(pcol):
        h = F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), pcol)), 1, 15),
            16,
            10,
        ).cast("bigint")
        return F.when(h % 100 < 15, 1).otherwise(0)

    marked = pos.select(
        "source",
        mask_bit(F.col("p")).alias("m"),
        F.when(F.col("p") == 0, 0)
        .otherwise(mask_bit(F.col("p") - 1))
        .alias("prev_m"),
    )
    span_starts = F.sum(
        F.when((F.col("m") == 1) & (F.col("prev_m") == 0), 1).otherwise(0)
    )
    return (
        marked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("total_tokens"),
            F.sum("m").cast("bigint").alias("masked_tokens"),
            F.expr("SUM(m) * 1000000 div COUNT(*)")
            .cast("bigint")
            .alias("mask_rate_e6"),
            span_starts.cast("bigint").alias("n_spans"),
            F.when(span_starts == 0, F.lit(0))
            .otherwise(
                F.expr(
                    "SUM(m) * 1000000"
                    " div SUM(CASE WHEN m = 1 AND prev_m = 0 THEN 1 ELSE 0 END)"
                )
            )
            .cast("bigint")
            .alias("avg_span_len_e6"),
        )
        .orderBy("source")
    )


# first-fit-decreasing fold body, Spark SQL: acc = bin remainders, x = the
# next (clamped) doc length. The first-fit index comes from ONE
# array_position over a boolean map (O(bins)), and the update is slice
# surgery around it — NOT a transform whose per-element lambda re-evaluates
# the index expression: Catalyst does no CSE inside lambdas (the shingles
# lesson), and the transform form measured O(bins^2) per step = 122 s at
# the 10x replica vs ~2 s for this form. array_position returns 0 when no
# bin fits (DuckDB's list_position returns NULL -> coalesced to 0).
_FFD_POS = "array_position(transform(acc, r -> r >= x), true)"
_FFD_STEP_SPARK = (
    "CASE WHEN size(acc) = 0 THEN array({B} - x)"
    f" WHEN {_FFD_POS} = 0"
    " THEN concat(acc, array({B} - x))"
    " ELSE concat("
    f" slice(acc, 1, CAST({_FFD_POS} AS INT) - 1),"
    f" array(element_at(acc, CAST({_FFD_POS} AS INT)) - x),"
    f" slice(acc, CAST({_FFD_POS} AS INT) + 1, size(acc))) END"
)


@query(
    "ffd_packing_report",
    oracle=f"""
    WITH lens AS (
        SELECT source,
               least(CAST(len({tokenize_sql('text')}) AS BIGINT), {_BUDGET}) AS n_tok
        FROM documents
        WHERE len({tokenize_sql('text')}) > 0
    ), per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
               list_reverse(list_sort(list(n_tok))) AS items
        FROM lens GROUP BY source
    ), packed AS (
        SELECT source, n_docs, total_tokens,
               list_reduce(
                   list_transform(items, x -> [{_BUDGET} - x]),
                   (acc, x) -> CASE
                       WHEN coalesce(list_position(
                                list_transform(acc, r -> r >= ({_BUDGET} - x[1])),
                                true), 0) = 0
                       THEN list_concat(acc, x)
                       ELSE list_concat(list_concat(
                            list_slice(acc, 1, list_position(
                                list_transform(acc, r -> r >= ({_BUDGET} - x[1])),
                                true) - 1),
                            [acc[list_position(
                                list_transform(acc, r -> r >= ({_BUDGET} - x[1])),
                                true)] - ({_BUDGET} - x[1])]),
                            list_slice(acc, list_position(
                                list_transform(acc, r -> r >= ({_BUDGET} - x[1])),
                                true) + 1, len(acc)))
                   END) AS bins
        FROM per_source
    )
    SELECT source, n_docs, total_tokens,
           CAST(len(bins) AS BIGINT) AS n_bins,
           CAST((total_tokens + {_BUDGET} - 1) // {_BUDGET} AS BIGINT)
               AS lower_bound_bins,
           CAST(total_tokens * 1000000 // (len(bins) * {_BUDGET}) AS BIGINT)
               AS fill_e6
    FROM packed ORDER BY source
    """,
)
def ffd_packing_report(
    spark: SparkSession, sf_dir: str, *, sub_shards: int = 1
) -> DataFrame:
    """First-fit-decreasing bin packing per source shard — the SPLIT-FREE
    packing alternative to `context_window_packing`: documents are never
    cut across windows (each bin holds whole documents padded to the 512
    budget; oversized docs clamp to one full window), sorted longest-
    first and placed into the first bin that fits. Reports bins used vs
    the ceil(total/512) lower bound and the realized fill — the
    packing-quality-vs-document-integrity tradeoff a trainer weighs
    (FFD guarantees <= 11/9 OPT + 6/9 bins, Johnson 1973).

    Distribution contract: bin packing is inherently sequential, so the
    fold runs PER SHARD over that shard's length list — a per-shard
    aggregate to a sorted array, then one aggregate() lambda fold
    (identical list_reduce in the oracle). ``sub_shards`` is the skew
    knob (see :func:`_shard_col`): at the default 1 a shard is a whole
    source (the oracle's contract); a 100 TB run raises it so the
    collected array and the O(docs x bins) fold are bounded by a hash
    slice of the hottest source, never the source itself, and the report
    rolls shards back up per source (n_bins = sum of per-shard bins — a
    valid whole-source packing, since shard-local bins are bins). Zero-
    token docs are excluded (they occupy no window). All arithmetic is
    exact int64; both engines replay the identical first-fit walk, so
    bin counts match bit-for-bit."""
    d = load_table(spark, sf_dir, "documents")
    lens = (
        d.select(
            "source",
            _shard_col(sub_shards).alias("shard"),
            F.size(tokenize("text")).cast("bigint").alias("raw_tok"),
        )
        .filter(F.col("raw_tok") > 0)
        .select(
            "source",
            "shard",
            F.least(F.col("raw_tok"), F.lit(_BUDGET)).alias("n_tok"),
        )
    )
    per_shard = lens.groupBy("source", "shard").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        F.reverse(F.sort_array(F.collect_list("n_tok"))).alias("items"),
    )
    step = _FFD_STEP_SPARK.format(B=_BUDGET)
    packed = per_shard.withColumn(
        "bins",
        F.expr(
            f"aggregate(items, CAST(array() AS ARRAY<BIGINT>),"
            f" (acc, x) -> {step})"
        ),
    )
    return (
        packed.groupBy("source")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("total_tokens").cast("bigint").alias("total_tokens"),
            F.sum(F.size("bins")).cast("bigint").alias("n_bins"),
            F.expr(f"(SUM(total_tokens) + {_BUDGET} - 1) div {_BUDGET}")
            .cast("bigint")
            .alias("lower_bound_bins"),
            F.expr(
                f"SUM(total_tokens) * 1000000"
                f" div (SUM(size(bins)) * {_BUDGET})"
            )
            .cast("bigint")
            .alias("fill_e6"),
        )
        .orderBy("source")
    )
