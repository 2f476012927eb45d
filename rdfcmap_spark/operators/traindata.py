"""Training-corpus assembly operators: deterministic splits and sequence
packing (the step between the dedup/quality family and the trainer).

No reference counterpart — rdfcmap stops at triple emission — but any
100 TB training-data pipeline needs exactly these transforms after
dedup/filtering, so they are first-class driver queries here:

* :func:`split_assign` — engine-portable deterministic train/val/test
  assignment: the bucket is ``int(md5(doc_id)[:6], 16) % 100`` (md5 of the
  decimal doc-id string, lowercase hex — byte-identical in Spark and
  DuckDB, so the oracle reproduces it verbatim). A hash split is the only
  correct split at scale: it is stable under re-partitioning, appends, and
  re-runs, unlike anything based on row order or ``rand()``.
* :func:`pack_concat_chunk` — the standard pretraining "concatenate then
  chunk at the context length" packing: documents are sharded by hash,
  ordered deterministically within the shard, laid end-to-end, and cut
  into ``budget``-token bins; each document row reports its (shard, bin,
  offset). One shuffle (the shard hash), one window — no Python.
* :func:`pack_greedy` — boundary-respecting greedy packing (a document
  never splits across bins: close the bin when the next document would
  overflow; an oversized document gets its own bin). The per-shard scan is
  inherently sequential, so it runs as an Arrow ``applyInPandas`` over
  shards — numpy inside, no per-row Python; shard count scales with the
  cluster, each shard's state is one cumulative counter.

Scale posture: all three are one-shuffle operators keyed on a
uniform-by-construction hash column (no skew: md5 buckets are balanced
regardless of doc-id distribution); the windows/scans inside a shard
stream in sorted order. At 100 TB the shard count is sized to executors
× a small factor, and packing output is written partitioned by shard so
the trainer's readers are sequential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: split fractions, in bucket points of 100: [0,80) train, [80,90) val,
#: [90,100) test
TRAIN_UPTO = 80
VAL_UPTO = 90


def _bucket100(doc_id_col) -> F.Column:
    """``int(md5(str(doc_id))[:6], 16) % 100`` — 24 bits of the digest; the
    2^24 % 100 modulo bias is ~1e-5 and identical in the oracle."""
    hex6 = F.substring(F.md5(doc_id_col.cast("string").cast("binary")), 1, 6)
    return (F.conv(hex6, 16, 10).cast("long") % 100).cast("int")


def split_assign(docs: DataFrame) -> DataFrame:
    """(doc_id, bucket, split) — deterministic 80/10/10 assignment."""
    b = _bucket100(F.col("doc_id"))
    return docs.select(
        "doc_id",
        b.alias("bucket"),
        F.when(b < TRAIN_UPTO, F.lit("train"))
        .when(b < VAL_UPTO, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def sample_stratified(
    docs: DataFrame,
    fractions: dict[str, float],
    default: float = 1.0,
    key: str = "source",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the "data mixing" step of a
    pretraining corpus (keep 100% of books, 10% of crawl, …).

    Keeps a row iff ``int(md5(str(doc_id) + ':sample')[:6], 16) % 10000 <
    frac * 10000`` for its stratum's fraction (``default`` for strata not
    listed). The hash is SALTED differently from :func:`split_assign`'s
    bucket so sampling and split assignment are independent — the sampled
    corpus still splits 80/10/10. Same portability contract: md5 of a
    string, reproducible verbatim in the DuckDB oracle, stable under
    re-partitioning and appends. Pure projection+filter — no shuffle, no
    Python.

    Output: the kept rows as (doc_id, stratum, sample_bucket).
    """
    hex6 = F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sample")).cast("binary")),
        1, 6,
    )
    b = (F.conv(hex6, 16, 10).cast("long") % 10000).cast("int")
    thr = F.lit(int(default * 10000))
    for k, frac in sorted(fractions.items()):
        thr = F.when(F.col(key) == k, F.lit(int(frac * 10000))).otherwise(thr)
    return docs.filter(b < thr).select(
        "doc_id", F.col(key).alias("stratum"), b.alias("sample_bucket")
    )


def _n_tokens(text_col) -> F.Column:
    """Whitespace token count (the packing unit; the BPE-ish count of
    textstats.token_stats slots in the same way)."""
    t = F.trim(text_col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("long")


def pack_concat_chunk(
    docs: DataFrame, budget: int = 2048, n_shards: int = 8
) -> DataFrame:
    """Concat-then-chunk packing: documents are laid end-to-end per shard in
    doc_id order and cut every ``budget`` tokens; a document may straddle a
    cut (the trainer's loader re-splits at token granularity).

    Output: (doc_id, shard, n_tokens, bin, off) — ``bin`` is the chunk the
    document STARTS in, ``off`` its token offset inside that chunk.
    """
    shard = (_bucket100(F.col("doc_id")) % n_shards).alias("shard")
    toks = docs.select("doc_id", shard, _n_tokens(F.col("text")).alias("n_tokens"))
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return toks.withColumn("_start", start).select(
        "doc_id", "shard", "n_tokens",
        F.floor(F.col("_start") / budget).cast("long").alias("bin"),
        (F.col("_start") % budget).cast("long").alias("off"),
    )


def pack_greedy(
    docs: DataFrame, budget: int = 2048, n_shards: int = 8
) -> DataFrame:
    """Boundary-respecting greedy packing: per shard, in doc_id order, a
    document joins the current bin unless it would push it past ``budget``
    (then a new bin opens); a single document larger than ``budget`` owns
    its bin (and only ever one — the next document always opens fresh).

    Output: (doc_id, shard, n_tokens, bin, fill) — ``fill`` is the bin's
    token count after this document. The scan is sequential per shard, so
    it runs as one Arrow batch job per shard (``applyInPandas``), numpy
    inside; shards are hash-balanced and sized to the cluster.
    """
    import pandas as pd

    shard = (_bucket100(F.col("doc_id")) % n_shards).alias("shard")
    toks = docs.select("doc_id", shard, _n_tokens(F.col("text")).alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, fills = [], []
        cur_bin, cur_fill = 0, 0
        for t in pdf["n_tokens"].to_numpy():
            if cur_fill > 0 and cur_fill + t > budget:
                cur_bin += 1
                cur_fill = 0
            cur_fill += int(t)
            bins.append(cur_bin)
            fills.append(cur_fill)
        pdf["bin"] = pd.Series(bins, dtype="int64")
        pdf["fill"] = pd.Series(fills, dtype="int64")
        return pdf

    return toks.groupBy("shard").applyInPandas(
        pack, "doc_id long, shard int, n_tokens long, bin long, fill long"
    )


def shuffle_order(docs: DataFrame, seed: str = "shuffle", n_parts: int = 32) -> DataFrame:
    """Deterministic global corpus shuffle — the "shuffle once before
    training" step. Every document gets a pseudo-random total-order position
    ``ord`` (1-based, dense) derived from ``md5(doc_id + ':' + seed)``:
    stable under re-partitioning/appends-at-the-end/re-runs, and a new seed
    is a fresh permutation.

    The global ordinal is built WITHOUT a single-partition window (the naive
    ``row_number() over (order by key)`` serializes the whole corpus through
    one task):

    1. ``repartitionByRange`` on (key, doc_id) — a range exchange, the same
       machinery as a distributed sort;
    2. per-partition ``row_number`` (window partitioned by the range
       partition id — parallel);
    3. partition ordinals lifted to global ones by adding each partition's
       cumulative row-count offset — an n_parts-row prefix sum computed
       IN-PLAN (its single-partition window holds n_parts rows, not data)
       and broadcast-joined back, so the whole operator is one action and
       the range exchange is computed once (ReusedExchange), never
       re-sampled across separate jobs.

    The result is invariant to where the range boundaries fall: ranges are
    ordered, so offset + within-rank IS the global rank. Output:
    (doc_id, shuffle_key, ord).
    """
    key = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":" + seed)).cast("binary")
    )
    ranged = (
        docs.select("doc_id", key.alias("shuffle_key"))
        .repartitionByRange(n_parts, "shuffle_key", "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    w = Window.partitionBy("pid").orderBy("shuffle_key", "doc_id")
    within = ranged.withColumn("within", F.row_number().over(w))
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    offw = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("n").over(offw), F.lit(0)).alias("off")
    )
    return within.join(F.broadcast(offsets), "pid").select(
        "doc_id",
        "shuffle_key",
        (F.col("off") + F.col("within")).cast("long").alias("ord"),
    )


def cap_per_source(docs: DataFrame, k: int = 100, key: str = "source") -> DataFrame:
    """Per-source contribution cap — "no single domain dominates the
    corpus" (the RefinedWeb/C4 mitigation for template farms and crawl
    loops): keep at most ``k`` documents per ``key`` stratum, chosen by a
    seeded-md5 rank so the survivors are a deterministic pseudo-random
    sample, not a head-of-table artifact.

    One shuffle (the window's hash partition on ``key``). Skew note: a hot
    source's partition holds all its rows, but the window only ranks and
    truncates — state is one counter per partition, and at 100 TB a
    pathological single-source corpus degrades to one big partition being
    SCANNED, not joined; cap it upstream with :func:`sample_stratified` if
    a stratum exceeds executor-partition scale.

    Output: the kept rows as (doc_id, stratum, rank_in_source).
    """
    h = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit(":cap")).cast("binary")
    )
    return (
        docs.select("doc_id", F.col(key).alias("stratum"), h.alias("h"))
        .withColumn("rank_in_source", F.row_number().over(
            Window.partitionBy("stratum").orderBy("h", "doc_id")
        ).cast("int"))
        .filter(F.col("rank_in_source") <= k)
        .select("doc_id", "stratum", "rank_in_source")
    )


def dense_ordinal(df: DataFrame, col: str, n_parts: int = 32) -> DataFrame:
    """(col, idx) — 1-based dense rank of ``col`` (distinct values, ordered
    ascending) built WITHOUT a single-partition window: range exchange →
    per-partition row_number → in-plan prefix-sum offsets (the
    :func:`shuffle_order` machinery generalized to any orderable column).
    The input must already be distinct on ``col``."""
    ranged = (
        df.select(col)
        .repartitionByRange(n_parts, col)
        .withColumn("pid", F.spark_partition_id())
    )
    w = Window.partitionBy("pid").orderBy(col)
    within = ranged.withColumn("within", F.row_number().over(w))
    counts = ranged.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    offw = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select("pid", F.coalesce(F.sum("n").over(offw), F.lit(0)).alias("off"))
    return within.join(F.broadcast(offsets), "pid").select(
        col, (F.col("off") + F.col("within")).cast("long").alias("idx")
    )


def kg_negatives(triples: DataFrame, k: int = 3) -> DataFrame:
    """Filtered negative sampling for KG-embedding training (TransE/DistMult
    family): for every true triple (subj, pred, obj), emit up to ``k``
    corrupted examples (subj, pred, neg_obj) where ``neg_obj`` is a
    hash-picked entity, dropping corruptions that collide with the true
    object or with ANY true triple (the standard "filtered" protocol, so no
    negative is secretly positive). This is the bridge from the constructed
    KG to an embedding-model training set — a first-class training-data
    product at corpus scale.

    Determinism: the ``i``-th negative for a triple indexes the entity
    table at ``int(md5(subj|pred|obj:neg·i)[:6], 16) % n_ents`` — the same
    md5-prefix device as :func:`split_assign`, reproducible verbatim in the
    DuckDB oracle and invariant to partitioning / cluster size. Entities
    are indexed by :func:`dense_ordinal` (range exchange + prefix-sum — no
    single-partition window at any size).

    Output: (subj, pred, obj, neg_i, neg_obj); a triple yields < k rows
    exactly when a corruption was filtered (collision with a true triple).

    Scale posture: the entity-index join shuffles on ``idx``, which is
    hash-uniform by construction (no hot entity no matter how skewed the
    real degree distribution); the filtered-protocol check is one left-anti
    join on the (subj, pred, obj) triple key; candidate volume is exactly
    k × |triples| before filtering. All JVM expressions.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    ents = (
        t.select(F.col("subj").alias("ent"))
        .unionByName(t.select(F.col("obj").alias("ent")))
        .distinct()
    )
    idx = dense_ordinal(ents, "ent")
    n = idx.agg(F.count(F.lit(1)).alias("n_ents"))
    cand = (
        t.crossJoin(F.broadcast(n))
        .select("*", F.explode(F.sequence(F.lit(1), F.lit(k))).alias("neg_i"))
    )
    hex6 = F.substring(
        F.md5(
            F.concat(
                F.concat_ws("|", F.col("subj"), F.col("pred"), F.col("obj")),
                F.lit(":neg"),
                F.col("neg_i").cast("string"),
            ).cast("binary")
        ),
        1, 6,
    )
    cand = cand.withColumn(
        "neg_idx", (F.conv(hex6, 16, 10).cast("long") % F.col("n_ents")) + 1
    )
    joined = cand.join(idx, cand.neg_idx == idx.idx).select(
        "subj", "pred", "obj", F.col("neg_i").cast("int").alias("neg_i"),
        F.col("ent").alias("neg_obj"),
    )
    true_keys = t.select(
        F.col("subj").alias("t_s"), F.col("pred").alias("t_p"), F.col("obj").alias("t_o")
    )
    return joined.filter(F.col("neg_obj") != F.col("obj")).join(
        true_keys,
        (F.col("subj") == F.col("t_s"))
        & (F.col("pred") == F.col("t_p"))
        & (F.col("neg_obj") == F.col("t_o")),
        "left_anti",
    )


def mixture_weights(
    docs: DataFrame, targets: dict[str, float] | None = None
) -> DataFrame:
    """Per-source sampling weights for corpus mixing — the knob a training
    pipeline turns to hit a TARGET token distribution over sources (web /
    books / code / …) that differs from the crawl's natural one.

    For each ``source``: observed token share ``p_s`` (source tokens /
    corpus tokens), target share ``t_s`` (uniform over the observed
    sources unless ``targets`` overrides), sampling weight
    ``w_s = t_s / p_s`` (probability multiplier per document draw) and
    ``epochs = w_s`` (expected passes over that source per corpus epoch —
    >1 means the source is repeated, the standard under-represented-domain
    upsampling). Shares/weights are deterministic ratios of exact BIGINT
    token counts, rounded for display.

    Scale posture: one map-side-combinable (source → docs, tokens)
    aggregate over the corpus scan + a 1-row broadcast total; output is
    |sources| rows. Zero Python in the count path.
    """
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(_n_tokens(F.col("text"))).alias("n_tokens")
    )
    tot = per.agg(
        F.sum("n_tokens").alias("tot_tokens"), F.count(F.lit(1)).alias("n_sources")
    )
    t_col = (
        F.element_at(
            F.create_map(*[F.lit(x) for kv in targets.items() for x in kv]),
            F.col("source"),
        )
        if targets
        else F.lit(1.0) / F.col("n_sources")
    )
    obs = F.col("n_tokens").cast("double") / F.col("tot_tokens").cast("double")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(obs, 9).alias("obs_share"),
            F.round(t_col, 9).alias("target_share"),
            F.round(t_col / obs, 6).alias("weight"),
        )
    )


def chunk_documents(docs: DataFrame, window: int = 64, overlap: int = 16) -> DataFrame:
    """RAG/pretraining chunking: slide a ``window``-token frame over each
    document with ``overlap`` tokens of context carry-over (stride =
    window - overlap). Starts are generated only while the chunk
    contributes at least one unseen token: once a window reaches the
    document end, no further starts are emitted (r4 ADVICE — the old
    ``start < n`` rule emitted trailing chunks fully contained in the
    previous one, pure duplicate training/RAG content). The final chunk
    may be shorter than ``window`` (>= 1 unseen token, no padding). Chunk
    text is the re-joined token slice — whitespace tokenization, the
    repo's token model (no reference counterpart; a training-data
    pipeline product).

    Pure per-row column work: split once, one ``sequence`` explode over
    chunk starts, slice+join per chunk — zero shuffle, zero UDF; output
    volume is corpus-linear (~n_tokens/stride rows per doc). Embarrassingly
    parallel at any scale.

    Output: (doc_id, chunk_idx, n_chunk_tokens, chunk_text) — chunk_idx
    0-based in document order.
    """
    if not 0 <= overlap < window:
        raise ValueError(f"need 0 <= overlap < window, got window={window}, overlap={overlap}")
    stride = window - overlap
    t = F.trim(F.col("text"))
    toks = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    n = F.size(F.col("_toks"))
    # starts: 0, stride, 2*stride, ..., stopping once a window covers the
    # document end: keep s <= n - overlap - 1, i.e. the first s with
    # s + window >= n is the last start (empty docs produce no chunk)
    starts = F.when(n == 0, F.array().cast("array<int>")).otherwise(
        F.sequence(F.lit(0), F.greatest(F.lit(0), n - F.lit(overlap) - 1), F.lit(stride))
    )
    sliced = F.slice(F.col("_toks"), F.col("start") + 1, window)
    return (
        docs.select("doc_id", toks.alias("_toks"))
        .select("doc_id", "_toks", F.posexplode(starts).alias("chunk_idx", "start"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(sliced).cast("long").alias("n_chunk_tokens"),
            F.array_join(sliced, " ").alias("chunk_text"),
        )
    )
