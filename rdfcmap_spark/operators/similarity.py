"""Similarity search over an embedding column (``array<float>``).

Two paths, mirroring a production ANN stack:

* :func:`topk_bruteforce` — exact cosine top-k: the correctness baseline.
  Query set × corpus join, rank per query. At 100 TB this is only run for
  evaluation samples (the query side is small → **broadcast** the queries,
  never shuffle the corpus).
* :func:`topk_clustered` — IVF-style: restrict the scan to the query's
  cluster (here the ``label`` column stands in for a nearest-centroid
  assignment; :func:`assign_clusters` computes true centroid assignment when
  needed). The corpus side is partition-pruned by cluster id — the scan cost
  drops by ~n_clusters and the join key (cluster) co-locates candidates.

Numeric determinism: dot products fold left-to-right over the array via
``F.aggregate`` in **double**; ranking uses the cosine rounded to 5 dp with
``vec_id`` as the total tie-break, so top-k is identical at any parallelism
and bit-comparable with the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TOPK = 5
QUERY_MOD = 50  #: vec_id % QUERY_MOD == 0 -> evaluation query vector


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i as a left fold in double (deterministic order). Kept as the
    tiny-data / reference implementation; the hot path is :func:`cosine`'s
    Arrow pandas UDF (HOF lambdas are interpreted; a fully unrolled column
    expression blows HotSpot's JIT method limit and drops to the bytecode
    interpreter — both measured ~100x too slow and parallelism-flat)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def _cosine_raw(a, b):
    """Arrow-batched cosine (pandas UDF body): numpy-vectorized across rows,
    but accumulated **column-by-column in index order** so every element's
    fold order is exactly the left-to-right fold of :func:`dot` — the result
    is bit-identical to the Column version (and to the DuckDB oracle's
    list_dot_product), not merely close."""
    import numpy as np
    import pandas as pd

    A = np.vstack(a.to_numpy()).astype(np.float64)
    B = np.vstack(b.to_numpy()).astype(np.float64)
    d = np.zeros(len(A))
    na = np.zeros(len(A))
    nb = np.zeros(len(A))
    for i in range(A.shape[1]):
        d = d + A[:, i] * B[:, i]
        na = na + A[:, i] * A[:, i]
        nb = nb + B[:, i] * B[:, i]
    return pd.Series(d / (np.sqrt(na) * np.sqrt(nb)))


def _cosine_udf():
    # built lazily: pandas_udf needs an active SparkContext to parse the
    # return type, which doesn't exist at import time
    return F.pandas_udf(_cosine_raw, "double")


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """Cosine similarity; ``dim`` retained for API stability (unused — the
    UDF reads the width from the batch). Rounding stays in Spark so the
    rounding mode matches every other rounded column."""
    return _cosine_udf()(a, b)


def embedding_dim(embeddings: DataFrame) -> int | None:
    """Peek the (fixed) vector width of an embedding column."""
    row = embeddings.select(F.size("embedding").alias("d")).first()
    return int(row["d"]) if row else None


def _ranked(pairs: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def topk_bruteforce(embeddings: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD) -> DataFrame:
    """Exact top-k cosine neighbors for the evaluation query set.

    (query_id, neighbor_id, rank, cos_sim[5dp]). The query side is tiny
    (1/query_mod of the corpus) → broadcast; the corpus is scanned once.
    """
    dim = embedding_dim(embeddings)
    q = embeddings.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    pairs = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qe"), F.col("ce"), dim), 5).alias("cos_sim"))
    )
    return _ranked(pairs, k)


def topk_clustered(embeddings: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD) -> DataFrame:
    """IVF-bucketed top-k: candidates restricted to the query's cluster
    (``label``). Join key = (label) — co-located, partition-prunable; this is
    the plan shape that survives 10^9 vectors (probe only 1/n_clusters of
    the corpus per query).
    """
    dim = embedding_dim(embeddings)
    q = embeddings.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("label"), F.col("embedding").alias("qe")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), "label", F.col("embedding").alias("ce"))
    pairs = (
        c.join(F.broadcast(q), "label")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qe"), F.col("ce"), dim), 5).alias("cos_sim"))
    )
    return _ranked(pairs, k)


def topk_ivf(
    embeddings: DataFrame,
    k: int = TOPK,
    query_mod: int = QUERY_MOD,
    nprobe: int = 2,
) -> DataFrame:
    """True IVF top-k: train (centroids) -> assign (nearest centroid per
    vector) -> multi-probe search (each query scans its ``nprobe`` nearest
    inverted lists).

    The round-1 ``topk_clustered`` bucketed on the pre-existing ``label``
    column and probed one bucket; this is the real shape: the corpus is
    partitioned by its *assigned* cluster, the query fans out to the nprobe
    nearest centroids (recall knob), and the candidate join is keyed on
    ``cluster`` — per-query scan cost is nprobe/n_clusters of the corpus,
    which is what survives 10^9 vectors. Determinism: cosines rounded to
    5 dp, ties broken on ids everywhere.
    """
    dim = embedding_dim(embeddings)
    cents = centroids(embeddings)
    assigned = assign_clusters(embeddings, cents)
    corpus = embeddings.select("vec_id", "embedding").join(assigned, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"), F.col("cluster"), F.col("embedding").alias("ce")
    )
    q = embeddings.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    qc = q.join(F.broadcast(cents.select(F.col("label").alias("cluster"), "centroid"))).select(
        "query_id",
        "cluster",
        "qe",
        F.round(cosine(F.col("qe"), F.col("centroid"), dim), 5).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("cluster").asc())
    probes = (
        qc.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "cluster", "qe")
    )
    pairs = (
        corpus.join(F.broadcast(probes), "cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce"), dim), 5).alias("cos_sim"),
        )
    )
    return _ranked(pairs, k)


def centroids(embeddings: DataFrame) -> DataFrame:
    """(label, centroid) — element-wise mean per label, computed by explode +
    groupBy(position) + re-assemble (no Python). Small output → broadcast."""
    dim = F.posexplode(F.col("embedding"))
    per_pos = (
        embeddings.select("label", dim.alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("m"))
    )
    return (
        per_pos.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("label", F.transform(F.col("pm"), lambda s: s.getField("m")).alias("centroid"))
    )


def assign_clusters(embeddings: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (one IVF training sweep): broadcast the
    centroid table, rank by cosine, keep the argmax. (vec_id, cluster)."""
    dim = embedding_dim(embeddings)
    scored = embeddings.select("vec_id", "embedding").join(
        F.broadcast(cents.select(F.col("label").alias("cluster"), "centroid"))
    ).select(
        "vec_id",
        "cluster",
        F.round(cosine(F.col("embedding"), F.col("centroid"), dim), 5).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), F.col("cluster").asc())
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).select(
        "vec_id", "cluster"
    )


def embedding_dup_pairs(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Embedding-cosine near-duplicates, EXACT within-label variant: pairs
    (a < b) in the same ``label`` cluster with cosine ≥ threshold.

    Scale honesty: ``label`` cardinality is fixed (it does not grow with the
    corpus), so bucket size — and the per-bucket self-join — is
    O(corpus/n_labels) and goes quadratic at scale (measured: 200k vectors /
    10 labels stalled a 32-core stage). This is the exact small-bucket path;
    the corpus-scale path is :func:`embedding_dup_pairs_lsh`, which blocks
    on random-hyperplane signatures whose bucket count grows with 2^band
    bits regardless of label skew.
    """
    dim = embedding_dim(embeddings)
    left = embeddings.select("label", F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    right = embeddings.select("label", F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    return (
        left.join(right, "label")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine(F.col("ea"), F.col("eb"), dim), 5).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


#: random-hyperplane LSH geometry for embedding near-dup blocking.
#: 8 bands x 16 planes: a random pair matches a 16-bit band with prob
#: 0.5^16 ~ 1.5e-5 (x8 bands -> ~1e-4 of the corpus-squared mass becomes a
#: candidate), while a true duplicate at cosine 0.99 (plane-agreement prob
#: p = 1 - acos(0.99)/pi = 0.955) is recalled with 1-(1-p^16)^8 ~ 0.995.
#: The band value space is 2^16 per band, so bucket size stays
#: ~corpus/65536 — the same fixed-cardinality-blocking fix as the 15-bit
#: simhash bands (operators/dedup.py).
HP_N_PLANES = 128
HP_BANDS = 8


def hyperplanes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 random hyperplanes (md5-keyed — no RNG state), so
    the Spark operator, the DuckDB oracle SQL, and the numpy reference test
    all derive the identical plane matrix."""
    import hashlib

    return [
        [
            1 if int(hashlib.md5(f"hp:{j}:{i}".encode()).hexdigest()[0], 16) < 8 else -1
            for i in range(dim)
        ]
        for j in range(n_planes)
    ]


def _band_values_udf(planes: list[list[int]], bands: int):
    """Arrow pandas UDF: embedding -> array of ``bands`` band values, each
    packing ``len(planes)//bands`` hyperplane sign bits. Dots accumulate
    column-by-column in index order (same left-fold as :func:`dot` and
    DuckDB's list_dot_product) so the sign — and thus the blocking key — is
    bit-identical across engines."""
    rows = len(planes) // bands

    def _f(col):
        import numpy as np
        import pandas as pd

        A = np.vstack(col.to_numpy()).astype(np.float64)
        P = np.array(planes, dtype=np.float64)  # n_planes x dim
        d = np.zeros((len(A), len(planes)))
        for i in range(A.shape[1]):
            d = d + A[:, i : i + 1] * P[:, i]
        bits = (d >= 0).astype(np.int64)
        weights = 1 << np.arange(rows, dtype=np.int64)
        vals = np.stack(
            [bits[:, b * rows : (b + 1) * rows] @ weights for b in range(bands)],
            axis=1,
        )
        return pd.Series(list(vals))

    return F.pandas_udf(_f, "array<long>")


def hyperplane_signatures(
    embeddings: DataFrame, n_planes: int = HP_N_PLANES, bands: int = HP_BANDS
) -> DataFrame:
    """(vec_id, band, band_val) — the LSH blocking keys, exposed as their own
    operator so the driver oracle exercises the full plane/fold/packing math
    on data where the pair query itself would be empty."""
    dim = embedding_dim(embeddings)
    planes = hyperplanes(n_planes, dim)
    sig = embeddings.select(
        "vec_id", _band_values_udf(planes, bands)(F.col("embedding")).alias("bvs")
    )
    return sig.select("vec_id", F.posexplode("bvs").alias("band", "band_val"))


def embedding_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = HP_N_PLANES,
    bands: int = HP_BANDS,
) -> DataFrame:
    """Embedding-cosine near-duplicates at corpus scale: block on
    random-hyperplane sign bands, verify exact cosine ≥ threshold on the
    candidates only. Recall follows the LSH S-curve — ~0.995 at cosine 0.99,
    dropping steeply below ~0.95 — i.e. it targets the duplicate regime, not
    low-threshold similarity (use :func:`embedding_dup_pairs` or
    :func:`topk_bruteforce` for those). Candidate volume is ~1e-4 of the
    corpus-squared mass plus the true near-dup cliques (which any
    pair-listing operator must output)."""
    dim = embedding_dim(embeddings)
    planes = hyperplanes(n_planes, dim)
    sig = embeddings.select(
        "vec_id",
        "embedding",
        _band_values_udf(planes, bands)(F.col("embedding")).alias("bvs"),
    )
    banded = sig.select(
        "vec_id", "embedding", F.posexplode("bvs").alias("band", "band_val")
    )
    left = banded.select(
        "band", "band_val", F.col("vec_id").alias("a"), F.col("embedding").alias("ea")
    )
    right = banded.select(
        "band", "band_val", F.col("vec_id").alias("b"), F.col("embedding").alias("eb")
    )
    return (
        left.join(right, ["band", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", F.round(cosine(F.col("ea"), F.col("eb"), dim), 5).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def embedding_dup_groups(embeddings: DataFrame, threshold: float = 0.9) -> DataFrame:
    """(vec_id, canonical_id) for EVERY embedding — the linear-output twin
    of :func:`embedding_dup_pairs_lsh`, mirroring
    :func:`rdfcmap_spark.operators.dedup.dup_groups` for the vector
    modality: hyperplane-LSH candidates, exact-cosine verify >= threshold,
    connected components, canonical = component min vec_id (singletons map
    to themselves). This is what a dedup pipeline consumes to drop all but
    one member of each near-identical-embedding cluster."""
    from rdfcmap_spark.operators import canonicalize

    pairs = embedding_dup_pairs_lsh(embeddings, threshold).select("a", "b")
    return canonicalize.canonical_ids_for_pairs(embeddings, pairs, "vec_id")


# --------------------------------------------------------------------------
# Product quantization (PQ): the memory-compression ANN path. At 10^9+
# vectors the corpus no longer fits RAM as full float vectors; PQ stores
# each vector as M small codes (here M=4 bytes instead of 64 floats) and
# scores queries against a per-query lookup table (ADC — asymmetric
# distance computation) — the candidate scan does NO vector math at all,
# just M table lookups + a sum per candidate.

PQ_M = 4  #: number of subspaces


def _sq_l2_raw(a, b):
    """Arrow-batched squared L2 (pandas UDF body): numpy-vectorized across
    rows, accumulated column-by-column in index order — bit-identical to a
    left fold (the :func:`_cosine_raw` determinism device). Applied at
    corpus-linear ENCODE time only (vector × codeword rows), never per
    candidate pair — that's the whole point of PQ."""
    import numpy as np
    import pandas as pd

    A = np.vstack(a.to_numpy()).astype(np.float64)
    B = np.vstack(b.to_numpy()).astype(np.float64)
    d = np.zeros(len(A))
    for i in range(A.shape[1]):
        t = A[:, i] - B[:, i]
        d = d + t * t
    return pd.Series(d)


def _sq_l2(a: Column, b: Column) -> Column:
    """Σ (a_i-b_i)² in double. Arrow pandas UDF, not an F.aggregate fold —
    the interpreted HOF fold was the encode bottleneck at bigscale (200k
    vectors × 40 codewords stalled a 32-core stage for minutes; the same
    ~100× HOF penalty measured for :func:`dot`)."""
    return F.pandas_udf(_sq_l2_raw, "double")(a, b)


def pq_codebooks(embeddings: DataFrame, m: int = PQ_M) -> DataFrame:
    """(m_idx, code, codeword) — one codebook per subspace, trained by the
    same one-sweep per-``label`` mean as :func:`centroids` (code = label
    id), restricted to the subspace's coordinate slice. Tiny output
    (m × n_labels rows) → always broadcast.

    Requires ``dim % m == 0``: a non-divisible dim would silently drop
    the trailing coordinates in encoding while training a phantom
    out-of-range codebook here — refused loudly instead."""
    dim = embedding_dim(embeddings)
    if dim % m != 0:
        raise ValueError(f"PQ requires dim % m == 0, got dim={dim}, m={m}")
    sub = dim // m
    per_pos = (
        embeddings.select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("mean"))
    )
    return (
        per_pos.withColumn("m_idx", (F.col("pos") / sub).cast("int"))
        .groupBy("m_idx", F.col("label").alias("code"))
        .agg(F.array_sort(F.collect_list(F.struct("pos", "mean"))).alias("pm"))
        .select(
            "m_idx",
            "code",
            F.transform(F.col("pm"), lambda s: s.getField("mean")).alias("codeword"),
        )
    )


def _subspaced(vecs: DataFrame, id_col: str, vec_col: str, dim: int, m: int) -> DataFrame:
    """(id, m_idx, subvec): explode each vector into its m coordinate
    slices — pure projection (slice + inline), zero shuffle."""
    if dim % m != 0:
        raise ValueError(f"PQ requires dim % m == 0, got dim={dim}, m={m}")
    sub = dim // m
    slices = F.array(
        *[
            F.struct(
                F.lit(i).alias("m_idx"),
                F.slice(F.col(vec_col), i * sub + 1, sub).alias("subvec"),
            )
            for i in range(m)
        ]
    )
    return vecs.select(F.col(id_col), F.inline(slices))


def pq_encode(embeddings: DataFrame, books: DataFrame, m: int = PQ_M) -> DataFrame:
    """(vec_id, m_idx, code): nearest codeword per subspace — the encode
    step that turns a float vector into M small integers. Distances are
    rounded to 6 dp with the code id as tie-break (engine-exact argmin,
    same contract as the 5-dp cosine ranking). Corpus-linear: one
    broadcast join against the codebooks, M×K rounded fold evaluations
    per vector, one window argmin bounded by K."""
    dim = embedding_dim(embeddings)
    scored = (
        _subspaced(embeddings, "vec_id", "embedding", dim, m)
        .join(F.broadcast(books), "m_idx")
        .select(
            "vec_id",
            "m_idx",
            "code",
            F.round(_sq_l2(F.col("subvec"), F.col("codeword")), 6).alias("d"),
        )
    )
    w = Window.partitionBy("vec_id", "m_idx").orderBy(F.col("d").asc(), F.col("code").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "m_idx", "code")
    )


def topk_pq(
    embeddings: DataFrame,
    k: int = TOPK,
    query_mod: int = QUERY_MOD,
    m: int = PQ_M,
) -> DataFrame:
    """PQ/ADC top-k: train codebooks → encode the corpus to M codes per
    vector → per query, build the M×K lookup table of subspace distances →
    score every candidate as the SUM of its M table entries (a join on
    (m_idx, code), no per-pair vector arithmetic) → rank ascending.

    Engine parity: table entries are rounded to 6 dp and summed as
    DECIMAL(18,6) — exact and order-free (the lm_score contract), so the
    (adc_dist asc, neighbor_id asc) ranking is identical on any engine or
    partitioning. Scale posture: the Q×N candidate stream is produced the
    same way as :func:`topk_bruteforce` (corpus × broadcast queries), but
    each candidate costs M dense-array lookups + a DECIMAL add — NO
    aggregate over the Q×N stream and no per-pair vector math. Measured
    at 200k corpus × 4k queries (800M candidates, 32 cores): explode-join
    + wide hash aggregate (v1) → nested-map lookups 1089 s → dense arrays
    + corpus-side fan-out 439 s, within 7% of the full-vector bruteforce
    wall while reading only codes — the remaining cost is the top-k
    window partial itself. Corpus-side prep (code arrays) and query-side
    prep (table arrays) are both linear and the query side is broadcast;
    the probed composition (:func:`topk_ivfpq`, 114 s at the same scale)
    is the scan-scale path.

    Output: (query_id, neighbor_id, rank, adc_dist).
    """
    books = pq_codebooks(embeddings, m)
    codes = pq_encode(embeddings, books, m)
    bidx = _book_index(books)
    # fan the corpus side out to the full core count BEFORE the Q-fold
    # candidate expansion: the code-map frame is corpus-linear (tiny), but
    # the downstream Q×N stream inherits ITS partitioning — measured at
    # 200k×16k ADC: 10 scan-inherited partitions left 2/3 of a 32-core box
    # idle through the top-k window partial
    cm = _fanout(_code_maps(codes, bidx))
    tq = _query_tables(embeddings, books, bidx, m, query_mod)
    pairs = _adc_score(
        cm.join(F.broadcast(tq)).filter(F.col("neighbor_id") != F.col("query_id")), m
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.col("adc_dist").cast("double").alias("adc_dist"))
    )


def _fanout(df: DataFrame) -> DataFrame:
    """Round-robin repartition of a SMALL frame to 2× the core count so
    the huge per-row fan-out it feeds (broadcast-join candidate expansion)
    saturates the cluster — the repartition itself shuffles only the small
    frame. Partitioning never affects results (every downstream aggregate/
    window is keyed)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism * 2)


def _book_index(books: DataFrame) -> DataFrame:
    """(m_idx, code, idx) — dense 0-based codeword index per subspace
    (codes are arbitrary label values; the ADC structures index ARRAYS, and
    Tungsten map element_at is an O(K) linear scan per lookup while array
    element_at is O(1) — measured: the map form paid ~40 comparisons per
    candidate). Tiny frame (M×K rows), deterministic (ordered by code)."""
    w = Window.partitionBy("m_idx").orderBy("code")
    return books.select(
        "m_idx", "code", (F.row_number().over(w) - 1).cast("int").alias("idx")
    )


def _code_maps(codes: DataFrame, bidx: DataFrame) -> DataFrame:
    """(neighbor_id, cm: array<int>) — the corpus side of the ADC scan
    folded to ONE row per vector: cm[m] = dense codeword index in subspace
    m (corpus-linear aggregate; ordered assembly via array_sort on
    (m_idx, idx) structs, the :func:`centroids` device)."""
    return (
        codes.join(F.broadcast(bidx), ["m_idx", "code"])
        .groupBy(F.col("vec_id").alias("neighbor_id"))
        .agg(F.array_sort(F.collect_list(F.struct("m_idx", "idx"))).alias("mi"))
        .select(
            "neighbor_id",
            F.transform(F.col("mi"), lambda s: s.getField("idx")).alias("cm"),
        )
    )


def _query_tables(
    embeddings: DataFrame, books: DataFrame, bidx: DataFrame, m: int, query_mod: int
) -> DataFrame:
    """(query_id, tt: array<array<decimal>>) — per-query ADC lookup tables
    as nested dense arrays (query-linear, broadcast-sized: M×K entries per
    query); tt[m][idx] = subspace squared-L2 to codeword ``idx``, rounded
    to 6 dp as DECIMAL(18,6)."""
    dim = embedding_dim(embeddings)
    q = embeddings.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    table = (
        _subspaced(q, "query_id", "embedding", dim, m)
        .join(F.broadcast(books.join(bidx, ["m_idx", "code"])), "m_idx")
        .select(
            "query_id",
            "m_idx",
            "idx",
            F.round(_sq_l2(F.col("subvec"), F.col("codeword")), 6)
            .cast("decimal(18,6)")
            .alias("d"),
        )
    )
    per_m = (
        table.groupBy("query_id", "m_idx")
        .agg(F.array_sort(F.collect_list(F.struct("idx", "d"))).alias("id_"))
        .select(
            "query_id",
            "m_idx",
            F.transform(F.col("id_"), lambda s: s.getField("d")).alias("dm"),
        )
    )
    return (
        per_m.groupBy("query_id")
        .agg(F.array_sort(F.collect_list(F.struct("m_idx", "dm"))).alias("md"))
        .select(
            "query_id",
            F.transform(F.col("md"), lambda s: s.getField("dm")).alias("tt"),
        )
    )


def _adc_score(pairs: DataFrame, m: int) -> DataFrame:
    """Add ``adc_dist`` = Σ_m tt[m][cm[m]] to a (… cm, tt) pair stream —
    M O(1) array lookups and a DECIMAL sum, pure column arithmetic."""
    terms = [
        F.element_at(
            F.element_at(F.col("tt"), F.lit(i + 1)),
            F.element_at(F.col("cm"), F.lit(i + 1)) + F.lit(1),
        )
        for i in range(m)
    ]
    adc = terms[0]
    for t in terms[1:]:
        adc = adc + t
    return pairs.select("query_id", "neighbor_id", adc.alias("adc_dist"))


def topk_pq_refined(
    embeddings: DataFrame,
    k: int = TOPK,
    query_mod: int = QUERY_MOD,
    m: int = PQ_M,
    refine: int = 8,
) -> DataFrame:
    """PQ/ADC shortlist + EXACT rerank — the production ANN shape (FAISS
    IVFADC+refine): the corpus scan stays code-only (ADC), but the top
    ``refine × k`` ADC candidates per query are reranked with the exact
    cosine before emitting top-k. Pure ADC cannot discriminate between
    vectors that share all M codes (they tie, and the tie-break is id
    order — see :func:`topk_pq`); the refine step restores member-level
    recall while touching only ``refine × k`` full vectors per query
    instead of the corpus.

    Output: (query_id, neighbor_id, rank, cos_sim) — same schema as
    :func:`topk_bruteforce` (ranking is by exact cosine).
    """
    shortlist = topk_pq(embeddings, k=refine * k, query_mod=query_mod, m=m).select(
        "query_id", "neighbor_id"
    )
    q = embeddings.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce"))
    pairs = (
        shortlist.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 5).alias("cos_sim"),
        )
    )
    return _ranked(pairs, k)


def topk_ivfpq(
    embeddings: DataFrame,
    k: int = TOPK,
    query_mod: int = QUERY_MOD,
    m: int = PQ_M,
    nprobe: int = 2,
) -> DataFrame:
    """IVF + PQ composed — the full FAISS-style IVFADC shape that survives
    10^9+ vectors: the coarse quantizer (:func:`centroids` /
    :func:`assign_clusters`) prunes the scan to ``nprobe`` inverted lists
    per query, and WITHIN the probed lists candidates are scored by ADC
    over PQ codes (:func:`pq_codebooks` / :func:`pq_encode`) — so the
    per-query cost is (nprobe/n_clusters) of the corpus in CODE reads,
    never a full-vector scan.

    Plan shape: the candidate join is keyed on ``cluster`` (the IVF
    restriction) with the per-query ADC tables broadcast; scoring is the
    same DECIMAL(18,6) table-entry sum as :func:`topk_pq` (exact,
    order-free). Output: (query_id, neighbor_id, rank, adc_dist).
    """
    dim = embedding_dim(embeddings)
    cents = centroids(embeddings)
    assigned = assign_clusters(embeddings, cents)
    books = pq_codebooks(embeddings, m)
    codes = pq_encode(embeddings, books, m)
    q = embeddings.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    qc = q.join(F.broadcast(cents.select(F.col("label").alias("cluster"), "centroid"))).select(
        "query_id",
        "cluster",
        F.round(cosine(F.col("embedding"), F.col("centroid"), dim), 5).alias("c_sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("cluster").asc())
    probes = (
        qc.withColumn("_pr", F.row_number().over(wq))
        .filter(F.col("_pr") <= nprobe)
        .select("query_id", "cluster")
    )
    bidx = _book_index(books)
    cm = _fanout(
        _code_maps(codes, bidx).join(
            assigned.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        )
    )
    tq = _query_tables(embeddings, books, bidx, m, query_mod)
    cand = _adc_score(
        cm.join(F.broadcast(probes), "cluster")
        .join(F.broadcast(tq), "query_id")
        .filter(F.col("neighbor_id") != F.col("query_id")),
        m,
    )
    w = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.col("adc_dist").cast("double").alias("adc_dist"),
        )
    )


def kmeans_iterate(embeddings: DataFrame, rounds: int = 3) -> DataFrame:
    """Iterative Lloyd k-means refinement of the coarse quantizer — the
    real "train" step the one-sweep :func:`centroids` approximates: seed
    from the per-``label`` means, then ``rounds`` synchronous
    assign→recompute passes (assignment by 5-dp-rounded cosine with the
    cluster id tie-break — the :func:`assign_clusters` contract — so the
    argmax, and therefore every downstream mean, is engine-exact; the
    means themselves are IEEE doubles, rounded at the OUTPUT only).

    Bounded-round determinism contract (same as :func:`~rdfcmap_spark.
    operators.graph.pagerank`): exactly ``rounds`` passes, no convergence
    probe — k-means on a fixed seed is deterministic, so the oracle
    unrolls the identical count. Clusters that lose every member simply
    disappear (documented Lloyd behavior on empty cells; no re-seeding).

    Scale posture per round: one broadcast of the K centroids against the
    corpus (K×N rounded cosines via the Arrow kernel), one per-vector
    window argmax (bounded by K), one map-side-combinable per-(cluster,
    pos) mean — corpus-linear, no shuffle wider than (cluster, pos).

    Output: (cluster, pos, mean6, n_members) — the centroid coordinates
    exploded to scalar rows (engine-hashable), mean rounded to 6 dp.
    """
    if rounds < 1:
        raise ValueError(f"kmeans_iterate needs rounds >= 1, got {rounds}")
    dim = embedding_dim(embeddings)
    cents = centroids(embeddings).select(
        F.col("label").alias("cluster"), "centroid"
    )
    for _ in range(rounds):
        scored = embeddings.select("vec_id", "embedding").join(
            F.broadcast(cents)
        ).select(
            "vec_id",
            "cluster",
            "embedding",
            F.round(cosine(F.col("embedding"), F.col("centroid"), dim), 5).alias("s"),
        )
        w = Window.partitionBy("vec_id").orderBy(F.col("s").desc(), F.col("cluster").asc())
        assigned = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "cluster", "embedding")
        )
        per_pos = (
            assigned.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
        )
        cents = (
            per_pos.groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "cluster",
                F.transform(F.col("pm"), lambda s: s.getField("m")).alias("centroid"),
            )
        )
        members = assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("n_members"))
    cents = cents.join(members, "cluster")
    return cents.select(
        "cluster",
        F.posexplode("centroid").alias("pos", "v"),
        "n_members",
    ).select(
        "cluster",
        "pos",
        F.round(F.col("v"), 6).alias("mean6"),
        F.col("n_members").cast("long").alias("n_members"),
    )


def ann_recall(
    embeddings: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD
) -> DataFrame:
    """recall@k of the IVF index against exact brute force — the standard
    ANN quality gate ("measure, don't guess": an index whose recall you
    have not measured is not an index you can ship). Per query:
    ``n_hits`` = |ivf top-k ∩ exact top-k|, ``recall_at_k`` = n_hits / k.

    Composition of :func:`topk_bruteforce` (ground truth) and
    :func:`topk_ivf` — one additional hash join on (query_id, neighbor_id)
    and a per-query count; both inputs are already bounded at k rows per
    query, so the eval is query-set-sized regardless of corpus scale.

    ``query_mod`` (round 5 — r4 review item) sizes the deterministic query
    SAMPLE the gate scores: the ground truth is a full corpus scan per
    query by definition, so a recurring gate at corpus scale must sample
    sparsely — e.g. 16x the default mod cut the 200k x 4k bigscale point
    from 625 s (every 50th vector) to a <60 s sampled gate; recall is a
    corpus property, so a deterministic thin sample estimates it as well
    as a dense one.

    Output: (query_id, n_hits, recall_at_k).
    """
    exact = topk_bruteforce(embeddings, k=k, query_mod=query_mod)
    approx = topk_ivf(embeddings, k=k, query_mod=query_mod).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.select("query_id", "neighbor_id")
        .join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            (F.col("n_hits").cast("double") / F.lit(float(k))).alias("recall_at_k"),
        )
    )


def filtered_topk(
    embeddings: DataFrame,
    documents: DataFrame,
    k: int = TOPK,
    query_mod: int = QUERY_MOD,
) -> DataFrame:
    """Quality-gated retrieval — the realistic RAG composition: the corpus
    side is restricted to documents that PASS the composite C4/Gopher
    quality filter (:func:`rdfcmap_spark.operators.textstats.
    quality_filter`'s integer-exact ``keep`` bit; vec_id == doc_id by the
    corpus contract) before the label-bucketed top-k runs. Retrieval over
    cleaned data is the production shape — indexing junk and filtering at
    query time wastes both the index and the scan.

    Plan: the keep-set semi-join prunes the corpus FIRST (predicate
    reaches the scan side before any pair work), queries broadcast, then
    the :func:`topk_clustered` bucket join — per-query scan cost is
    keep_ratio/n_clusters of the corpus.

    Output: (query_id, neighbor_id, rank, cos_sim) — same contract as the
    other top-k variants.
    """
    from rdfcmap_spark.operators.textstats import quality_filter

    dim = embedding_dim(embeddings)
    keep = quality_filter(documents).filter(F.col("keep")).select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = embeddings.join(keep, "vec_id", "left_semi")
    q = embeddings.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("label"), F.col("embedding").alias("qe")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), "label", F.col("embedding").alias("ce")
    )
    pairs = (
        c.join(F.broadcast(q), "label")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce"), dim), 5).alias("cos_sim"),
        )
    )
    return _ranked(pairs, k)


def hard_negatives(
    embeddings: DataFrame,
    k: int = TOPK,
    query_mod: int = QUERY_MOD,
    dup_threshold: float = 0.9,
) -> DataFrame:
    """Hard-negative mining for retriever training (round 5): per
    evaluation query, the ``k`` highest-cosine corpus vectors that are
    NOT near-duplicates of it — the closest non-positives, i.e. exactly
    the pairs that teach a contrastive model its decision boundary
    (random negatives are trivially separable; the hard ones live just
    outside the positive set). Positives = the query's
    :func:`embedding_dup_groups` component (hyperplane-LSH + exact
    cosine verify at ``dup_threshold``), so the exclusion is the same
    near-dup semantics the dedup pipeline ships.

    Plan: one co-keyed hash join attaches the component id to the corpus
    (and to the broadcast query side), then the label-bucketed pair scan
    of :func:`topk_clustered` with the same-component filter pushed
    below the rank window — per-query scan cost stays 1/n_buckets of
    the corpus, and the group join adds one vec_id-keyed shuffle.

    Output: (query_id, neighbor_id, rank, cos_sim) — same contract as
    the other top-k variants.
    """
    dim = embedding_dim(embeddings)
    groups = embedding_dup_groups(embeddings, threshold=dup_threshold)
    q = (
        embeddings.filter(F.col("vec_id") % query_mod == 0)
        .join(groups, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            "label",
            F.col("embedding").alias("qe"),
            F.col("canonical_id").alias("qg"),
        )
    )
    c = embeddings.join(groups, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.col("embedding").alias("ce"),
        F.col("canonical_id").alias("cg"),
    )
    pairs = (
        c.join(F.broadcast(q), "label")
        .filter(F.col("qg") != F.col("cg"))  # excludes self + all positives
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qe"), F.col("ce"), dim), 5).alias("cos_sim"),
        )
    )
    return _ranked(pairs, k)
