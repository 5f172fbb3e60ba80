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


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-scaled corpus rebalancing (the multilingual-LM α-mixing
    recipe: sample stratum *l* with probability ∝ p_l^α, α<1 flattening
    the head so low-resource strata are seen more).  Weights are derived
    from the data itself — one tiny aggregation — then applied with the
    same deterministic hash-copies mechanism as :func:`hash_sample`:

        w_l = (n_max / n_l) ^ (1 - α)    (largest stratum keeps weight 1,
                                          smaller strata upsample toward
                                          the α-tempered distribution)

    Normalizing by ``n_max`` instead of the usual Σ p^α keeps every
    arithmetic step IEEE-correctly-rounded (max of integers, one divide,
    one pow/sqrt) — no order-dependent float summation — so the
    micro-integerized weight ``floor(10^6·w_l)`` is bit-reproducible
    across engines and reruns (the DuckDB oracle recomputes it exactly).
    After applying, stratum share ∝ n_l·w_l ∝ n_l^α: exactly the
    α-tempered mixture, rescaled.

    Returns the input columns plus ``weight_micro`` and ``n_copy``.

    Scale design: one map-side-combine count per stratum (strata are
    languages/sources — tiny), broadcast-joined back; the copy decision
    is map-only hash logic as in :func:`hash_sample`.  α = 0.5 uses
    ``sqrt`` (correctly rounded everywhere); other α go through ``pow``,
    which is last-ulp engine-dependent — fine for training, but use 0.5
    for cross-engine-exact contracts.
    """
    counts = docs.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    n_max = counts.agg(F.max("_n").alias("_nmax"))
    ratio = F.col("_nmax").cast("double") / F.col("_n").cast("double")
    w = F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    weights = counts.crossJoin(F.broadcast(n_max)).select(
        stratum_col,
        F.floor(w * _MOD).cast("bigint").alias("weight_micro"),
    )
    d = docs.join(F.broadcast(weights), on=stratum_col, how="inner")
    bucket = _hash_bucket(F.col(id_col), salt)
    full = F.floor(F.col("weight_micro") / _MOD).cast("bigint")
    frac_micro = F.col("weight_micro") % _MOD
    n_copies = full + F.when(bucket < frac_micro, 1).otherwise(0)
    return (
        d.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("n_copy", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def epoch_shards(
    docs: DataFrame,
    epochs: int = 3,
    n_shards: int = 64,
    id_col: str = "doc_id",
    salt: str = "epoch",
) -> DataFrame:
    """Deterministic per-epoch shard assignment — the scale-correct form
    of "shuffle the corpus differently every epoch".  A global random
    permutation needs a total order (single-node sort or rank window);
    training loaders instead reshuffle by re-sharding: for epoch *e*,
    document *d* lands in shard ``md5(salt:e:d) mod n_shards``, and
    shards are read in order while documents within a shard are ordered
    by the same hash.  Different epochs → independent assignments; no
    shuffle key is ever coordinated globally.

    Returns ``(epoch, shard, sort_key, <id_col>)`` — write partitioned by
    ``(epoch, shard)`` with ``sortWithinPartitions(sort_key)`` and the
    loader streams shards sequentially.

    Scale design: map-only (an ``explode`` over the epoch sequence and
    one md5 per (epoch, doc)); the write's ``partitionBy(epoch, shard)``
    is the only exchange, and it is the layout the trainer wants anyway.
    """
    e = F.explode(F.sequence(F.lit(0), F.lit(epochs - 1))).alias("epoch")
    d = docs.select(F.col(id_col), e)
    key = F.md5(
        F.concat_ws(":", F.lit(salt), F.col("epoch").cast("string"),
                    F.col(id_col).cast("string"))
    )
    return d.select(
        "epoch",
        (
            F.conv(F.substring(key, 1, 8), 16, 10).cast("bigint") % n_shards
        ).alias("shard"),
        key.alias("sort_key"),
        id_col,
    )


def leakage_safe_split(
    docs: DataFrame,
    ratios: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split:v1",
    clusters: DataFrame | None = None,
) -> DataFrame:
    """Duplicate-cluster-aware train/val/test split.

    Hashing the DOCUMENT id leaks: near-duplicates straddle the split
    boundary and the eval set scores memorization (the classic
    train/test-contamination failure).  The split key here is the
    duplicate-family component — every member of an LSH duplicate cluster
    (``dedup.lsh_duplicate_clusters``: full connected components over
    star-contracted buckets) lands in the SAME split; singletons key on
    themselves.  The assignment is the same md5-bucket rule as
    :func:`hash_sample` (map-only, no RNG state, rerun-stable, DuckDB-
    reproducible): bucket(component) falls into cumulative ratio ranges
    in declaration order.

    100 TB: one left join against the (small) cluster table + a map-only
    bucket expression; the CC itself is the already-bounded
    ``lsh_duplicate_clusters`` path.  Pass ``clusters`` to reuse a
    materialized cluster table across pipeline stages.

    Returns ``(doc_id, split_key, split)``.
    """
    total = sum(ratios.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split ratios must sum to 1, got {total}")
    if clusters is None:
        from rdfshape_api_spark.functions.dedup import lsh_duplicate_clusters

        clusters = lsh_duplicate_clusters(docs)
    keyed = (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            clusters.select(
                F.col("doc_id").alias("_c_doc"), F.col("component")
            ),
            on=[F.col("doc_id") == F.col("_c_doc")],
            how="left",
        )
        .withColumn("split_key", F.coalesce(F.col("component"), F.col("doc_id")))
        .select("doc_id", "split_key")
    )
    bucket = _hash_bucket(F.col("split_key"), salt)
    names = list(ratios)
    col = None
    acc = 0.0
    for name in names[:-1]:
        acc += ratios[name]
        cnd = bucket < int(round(acc * _MOD))
        col = F.when(cnd, name) if col is None else col.when(cnd, name)
    split = col.otherwise(names[-1]) if col is not None else F.lit(names[-1])
    return keyed.withColumn("split", split)


def per_source_cap(
    docs: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "cap",
) -> DataFrame:
    """Per-source quota: keep at most ``cap`` documents from each source,
    chosen deterministically — the skew guard every corpus recipe applies
    so one giant crawl/domain/repo cannot flood the mixture (Dolma's
    per-source quotas, RefinedWeb's domain caps).

    Selection is the hash-rank within the source: documents ordered by
    ``md5(salt ':' id)`` (id tiebreak), first ``cap`` survive.  Hash
    order ≈ a uniform random sample, but with no RNG state: rerun-stable,
    engine-portable (a DuckDB ``ROW_NUMBER() OVER (PARTITION BY source
    ORDER BY md5(...))`` reproduces the exact set), and append-stable in
    the sense that a document's rank only grows as a source grows.

    Returns the input columns plus ``src_rank`` (1-based).

    Scale design: ONE shuffle (hash-partition by source) + per-partition
    sort — the window never needs a global order.  At pathological skew
    (one source ≫ executor memory) the same decision can be taken in two
    passes: salted per-bucket top-``cap`` then a merge of ``n_salt·cap``
    candidates; the single-window form is right up to ~10^8 docs/source
    since only (id, hash) pairs sort, not payloads.
    """
    if cap < 1:
        raise ValueError(f"per_source_cap: cap must be >= 1, got {cap}")
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = Window.partitionBy(source_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.withColumn("src_rank", F.row_number().over(w))
        .filter(F.col("src_rank") <= cap)
    )


def pack_token_ids(
    encoded: DataFrame,
    seq_len: int,
    n_shards: int = 1024,
    id_col: str = "doc_id",
    ids_col: str = "token_ids",
) -> DataFrame:
    """Concat-and-chunk packing — the last mile of a pretraining data
    pipeline: concatenate the token ids of a shard's documents (in
    deterministic ``doc_id`` order) and cut the stream into fixed
    ``seq_len`` sequences.  Each shard's trailing partial sequence is
    DROPPED (the standard block-packing loader behavior; padding is a
    trainer concern).  Returns ``(shard, seq_idx, token_ids[seq_len])``.

    Scale design — no per-token shuffle: the naive plan (posexplode every
    token, row_number, re-group) shuffles ONE ROW PER TOKEN, i.e. the
    whole 100 TB corpus re-keyed token-wise.  Here the only movement is
    ONE repartition of doc-level rows by shard; inside each partition a
    streaming Arrow kernel chunks with an O(seq_len + longest doc) buffer.
    ``sortWithinPartitions(shard, doc_id)`` keeps every shard contiguous
    and ordered, so the output is bit-identical under ANY partition count
    or executor fleet — the property the DuckDB twin checks.
    """
    import pandas as pd

    if seq_len < 1:
        raise ValueError(f"pack_token_ids: seq_len must be >= 1, got {seq_len}")

    d = encoded.select(
        (F.col(id_col) % n_shards).cast("int").alias("shard"),
        F.col(id_col).alias("doc_id"),
        F.col(ids_col).alias("token_ids"),
    )

    schema = "shard int, seq_idx long, token_ids array<int>"

    def kernel(batches):
        cur_shard, buf, seq_idx = None, [], 0
        for pdf in batches:
            out_s, out_i, out_t = [], [], []
            for shard, ids in zip(pdf["shard"], pdf["token_ids"]):
                if shard != cur_shard:
                    cur_shard, buf, seq_idx = shard, [], 0  # drop prior remainder
                buf.extend(int(x) for x in ids)
                while len(buf) >= seq_len:
                    out_s.append(shard)
                    out_i.append(seq_idx)
                    out_t.append(buf[:seq_len])
                    del buf[:seq_len]
                    seq_idx += 1
            yield pd.DataFrame(
                {"shard": out_s, "seq_idx": out_i, "token_ids": out_t}
            )

    return (
        d.repartition("shard")
        .sortWithinPartitions("shard", "doc_id")
        .mapInPandas(kernel, schema=schema)
    )
