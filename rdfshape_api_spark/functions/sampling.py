"""Deterministic corpus sampling / mixing over the ``documents`` table.

Training-data pipelines mix sources with per-stratum weights (e.g.
Wikipedia ×3, Common Crawl ×0.3 — the GPT-3 / Pile / Dolma recipe).  At
100 TB the sampler must be a map-only deterministic filter — no RNG
state, no shuffle, reproducible across reruns and engines — so the keep
decision hashes the document id: a row survives iff

    md5(salt ':' id) mod 10^6  <  frac(weight) * 10^6

and integer parts of the weight emit whole extra copies (upsampling).
The hash is the same md5-prefix trick the LSH planes use, so a DuckDB
oracle reproduces the exact sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_MOD = 1_000_000


def _hash_bucket(id_col, salt: str):
    """Deterministic bucket in [0, 10^6): first 8 md5 hex chars of
    'salt:id' as an integer, mod 10^6 — portable to DuckDB."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return h % _MOD


def hash_sample(
    docs: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministic stratified sample with upsampling: each stratum
    (value of ``stratum_col``) is kept with its weight — the fractional
    part via the hash-bucket filter, the integer part as whole repeated
    copies (``n_copy`` 0..k distinguishes them downstream, e.g. for
    epoch-aware shuffling).  Strata absent from ``weights`` are dropped
    (weight 0) — the explicit-manifest convention of corpus-mixing
    recipes.

    Returns the input columns plus ``n_copy``.

    Scale design: pure map-only Column logic — a literal CASE chain over
    the (tiny, driver-known) weight manifest, one md5 per row, a
    ``posexplode`` bounded by ceil(max weight); no shuffle, no RNG state,
    rerun-stable (append-safe for incremental corpus builds).  Filter
    and projection push down to the scan.
    """
    if not weights:
        raise ValueError("hash_sample: weights manifest is empty")
    w = F.lit(None).cast("double")
    for stratum, weight in weights.items():
        w = F.when(F.col(stratum_col) == stratum, F.lit(float(weight))).otherwise(w)
    bucket = _hash_bucket(F.col(id_col), salt)
    full = F.floor(w).cast("int")
    frac = w - F.floor(w)
    # copies: full ones always; one more when the hash falls under frac
    n_copies = full + F.when(bucket < (frac * _MOD).cast("bigint"), 1).otherwise(0)
    return (
        docs.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("n_copy", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    n_shards: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget sequence packing: assign documents to fixed-budget
    training sequences (bins).  Globally-greedy packing is inherently
    sequential, so this is the distributed-standard contiguous variant:
    documents are sharded deterministically (``id % n_shards``), ordered
    by id inside the shard, and binned by the running token count —
    ``bin_id = floor(tokens_before / max_tokens)``.  A bin can overflow
    by at most the document that straddles its boundary; the downstream
    tokenizer truncates or pads, exactly as block-packing pretraining
    loaders do.

    Returns ``(doc_id, shard, bin_id, n_tokens)``.

    Scale design: ONE window per shard — ``partitionBy(shard)`` keeps the
    sort local to a shard (no global order, no single-partition window);
    the cumulative sum is a single pass and shard count × budget bounds
    per-task state.  Bin ids are shard-local by construction, so bins can
    be written as ``partitionBy(shard)`` output files with no further
    shuffle.
    """
    from pyspark.sql import Window

    from rdfshape_api_spark.functions.textops import ws_token_count

    d = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        ws_token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.withColumn(
        "bin_id", F.floor(cum_before / max_tokens).cast("bigint")
    )
