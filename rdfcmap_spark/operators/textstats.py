"""Text-analysis operators for the large-scale training-data pipeline.

These run over the ``documents`` table (``doc_id, text, lang, source,
n_chars``) and are the text-QA counterpart of the KG pipeline's mention
normalization (SURVEY.md X1/X9): token counting, quality scoring, language
identification, and document fingerprinting.

Design rules (100 TB posture):

* every operator is a **narrow projection** — pure built-in expressions
  (``regexp_count`` / ``length`` / ``md5``), one codegen'd pass over the
  text column, zero shuffles except the final aggregate where one exists;
* no Python in the hot path (BASELINE.json input_hint: no per-row Python);
* all derived floats are single divisions of integer counts rounded to a
  fixed precision, so output is bit-stable across engines, partitionings and
  cluster sizes (the two-cluster-size invariant).

Every function has an exact ANSI-SQL mirror in ``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: token = maximal run of non-whitespace (identical in Java regex and RE2)
TOKEN_RE = r"\S+"

#: BPE-ish pre-tokenizer (GPT-2-style: contraction suffixes, space-prefixed
#: letter runs, digit runs, punctuation runs) — the unit LLM token budgets
#: are estimated in. Deliberately lookahead-free so Java regex (Spark) and
#: RE2 (DuckDB oracle) match identically; both engines use leftmost-first
#: alternation, so counts agree byte-for-byte.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

#: English-ish stopwords for the quality score (word-boundary matched).
STOPWORDS = ["the", "a", "an", "of", "to", "and", "in", "is", "on", "for"]

#: tiny per-language stopword lists for the n-gram/stopword language
#: heuristic. Deterministic argmax with alphabetical-language tie-break.
LANG_MARKERS = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit"],
    "en": ["the", "and", "is", "of", "to", "in", "that", "it"],
    "es": ["el", "la", "los", "las", "es", "y", "que", "de"],
    "fr": ["le", "la", "les", "et", "est", "que", "des", "une"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不"],
}

N_SHINGLE = 3  #: word n-gram size for fingerprint / jaccard / minhash


def _word_re(words: list[str]) -> str:
    """Alternation over marker words. ``\\b`` is an **ASCII** word boundary in
    both Java regex and RE2 — wrapping CJK characters in it matches nothing —
    so non-ASCII marker sets get a plain (unanchored) alternation instead."""
    if all(w.isascii() for w in words):
        return r"\b(" + "|".join(words) + r")\b"
    return "(" + "|".join(words) + ")"


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token counts + average token length.

    ``avg_token_len`` = non-whitespace chars / tokens — a single integer
    division rounded to 5 dp (cross-engine stable). ``n_bpe_tokens`` counts
    :data:`BPE_TOKEN_RE` matches — the LLM-token-budget estimate a
    training-data pipeline filters and packs by.
    """
    n_tokens = F.regexp_count(F.col("text"), F.lit(TOKEN_RE))
    n_nonws = F.length(F.regexp_replace(F.col("text"), r"\s", ""))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit(BPE_TOKEN_RE)).cast("bigint").alias(
            "n_bpe_tokens"
        ),
        F.round(n_nonws.cast("double") / n_tokens, 5).alias("avg_token_len"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic document-quality features + combined score.

    stopword / punctuation / digit ratios and a weighted score; the exact
    feature set mirrors common pretraining-corpus filters (length bounds,
    symbol ratios, stopword presence). Ratios are single int/int divisions
    rounded to 5 dp; the combined score is **pure integer arithmetic**
    (per-mille 0..1000) — a weighted sum of rounded doubles lands exactly on
    round-half boundaries, which Spark (BigDecimal HALF_UP on the binary
    expansion) and other engines break differently.
    """
    n_tokens = F.regexp_count(F.col("text"), F.lit(TOKEN_RE)).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    n_stop = F.regexp_count(F.col("text"), F.lit(_word_re(STOPWORDS))).cast("bigint")
    n_punct = F.regexp_count(F.col("text"), F.lit(r"[^\w\s]")).cast("bigint")
    n_digit = F.regexp_count(F.col("text"), F.lit(r"[0-9]")).cast("bigint")
    stop_r = F.round(n_stop.cast("double") / n_tokens, 5)
    punct_r = F.round(n_punct.cast("double") / n_chars, 5)
    digit_r = F.round(n_digit.cast("double") / n_chars, 5)
    len_ok = (F.col("n_chars") >= 100) & (F.col("n_chars") <= 20000)
    # floor(a/b) on bigints is engine-stable: exact when b|a, else ≥1/b from
    # the boundary (≫ double ulp)
    score = (
        F.when(len_ok, F.lit(400)).otherwise(F.lit(0))
        + F.floor(F.least(F.lit(300) * 5 * n_stop, F.lit(300) * n_tokens) / n_tokens)
        + F.floor(
            F.lit(300) * (n_chars - F.least(n_punct + n_digit, n_chars)) / n_chars
        )
    ).cast("bigint")
    return docs.select(
        "doc_id",
        stop_r.alias("stopword_ratio"),
        punct_r.alias("punct_ratio"),
        digit_r.alias("digit_ratio"),
        score.alias("quality_score"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Stopword-marker language ID (deterministic argmax, ties -> first
    language in alphabetical order). A real system would use char n-gram
    profiles; the *plumbing* (per-doc vectorized scoring + argmax ladder) is
    the part that must scale, and it is one codegen pass.
    """
    scores = {
        lang: F.regexp_count(F.col("text"), F.lit(_word_re(words)))
        for lang, words in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    pred = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return docs.select(
        "doc_id",
        *[scores[lang].cast("bigint").alias(f"score_{lang}") for lang in sorted(LANG_MARKERS)],
        F.when(best > 0, pred).otherwise(F.lit("und")).alias("lang_pred"),
    )


def shingles(docs: DataFrame, n: int = N_SHINGLE) -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams per document.

    Built entirely from array functions: ``split`` -> ``sequence``/
    ``transform`` -> ``explode``. One narrow pass; the distinct is per-doc
    and partial-aggregated map-side.
    """
    with_toks = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")).filter(
        F.size("t") >= n
    )
    idx = F.sequence(F.lit(0), F.size("t") - n)
    sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)))
    return (
        with_toks.select("doc_id", F.explode(sh).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def fingerprints(docs: DataFrame, n: int = N_SHINGLE) -> DataFrame:
    """Document fingerprint = min md5 over word n-gram shingles (bottom-1
    MinHash / winnowing-lite). Used as a cheap near-dup blocker and as the
    rolling-hash fingerprint of SURVEY.md's text-analysis inventory.
    """
    return shingles(docs, n).groupBy("doc_id").agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))


def ngrams_all(docs: DataFrame, n: int) -> DataFrame:
    """(doc_id, gram) — **every occurrence** of each word n-gram (NOT
    deduplicated, unlike :func:`shingles`): the unit the repetition signals
    count. Same narrow split -> sequence/transform -> explode pass."""
    with_toks = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")).filter(
        F.size("t") >= n
    )
    idx = F.sequence(F.lit(0), F.size("t") - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(F.col("t"), i + 1, n)))
    return with_toks.select("doc_id", F.explode(grams).alias("gram")).filter(F.col("gram") != "")


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", table A1 repetition filters) — the standard
    pretraining-corpus filter for boilerplate / degenerate generation loops:

    * ``top_2gram_frac`` — tokens covered by the single most frequent word
      2-gram: ``2 * max_count / n_tokens`` (0 when fewer than 2 tokens);
    * ``dup_3gram_frac`` — fraction of 3-gram *occurrences* that are
      repeats: ``(total - distinct) / total`` (0 when fewer than 3 tokens).

    (Gopher's duplicate-*line* fractions degenerate on single-line text and
    are omitted; the n-gram family is the scale-relevant machinery.)

    Shape at 100 TB: one shuffle keyed (doc_id, gram) with map-side partial
    counts, then a map-side-combined rollup to doc_id — both keys carry
    doc_id so there is no hot key regardless of how common a gram is
    globally. Ratios are single integer divisions rounded to 5 dp
    (cross-engine / cluster-size stable).
    """
    g2 = (
        ngrams_all(docs, 2)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max2"))
    )
    g3 = (
        ngrams_all(docs, 3)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("tot3"), F.count("*").alias("dst3"))
    )
    n_tokens = F.regexp_count(F.col("text"), F.lit(TOKEN_RE)).cast("bigint")
    return (
        docs.select("doc_id", n_tokens.alias("n_tokens"))
        .join(g2, "doc_id", "left")
        .join(g3, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(
                F.round(F.lit(2) * F.col("max2").cast("double") / F.col("n_tokens"), 5),
                F.lit(0.0),
            ).alias("top_2gram_frac"),
            F.coalesce(
                F.round(
                    (F.col("tot3") - F.col("dst3")).cast("double") / F.col("tot3"), 5
                ),
                F.lit(0.0),
            ).alias("dup_3gram_frac"),
        )
    )


def decontaminate(
    docs: DataFrame, benchmark: DataFrame, n: int = N_SHINGLE, min_hits: int = 2
) -> DataFrame:
    """Benchmark decontamination — flag training documents that overlap an
    evaluation set (the GPT-3 appendix-C / PaLM n-gram-collision method):
    a doc is ``contaminated`` when ≥ ``min_hits`` of its distinct word
    n-grams appear anywhere in the benchmark corpus.

    ``benchmark`` is any frame with (doc_id, text). Output: one row per
    input doc — (doc_id, n_contaminated_grams, contaminated).

    Shape at 100 TB: the benchmark's distinct n-gram set is small (eval
    suites are ~10^5 docs vs 10^10 training docs) and is **broadcast**, so
    the training side is a map-side hash semi-probe — no shuffle of the
    corpus; the only exchange is the per-doc count keyed on doc_id. If the
    benchmark outgrows broadcast, drop the hint and the same plan degrades
    gracefully to a shuffled join on ``shingle``.
    """
    bench_grams = shingles(benchmark, n).select("shingle").distinct()
    hits = (
        shingles(docs, n)
        .join(F.broadcast(bench_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_contaminated_grams", F.lit(0)).cast("bigint").alias(
                "n_contaminated_grams"
            ),
            (F.coalesce("n_contaminated_grams", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


#: PII surface patterns. Deliberately lookahead/backreference-free so Java
#: regex (Spark) and RE2 (DuckDB oracle) count identical non-overlapping
#: leftmost-first matches. ``\b`` is ASCII in both engines.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+?[0-9][0-9 ().-]{7,14}[0-9]",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-document PII surface counts (email / IPv4 / phone-like / SSN-like
    patterns) + total — the scrubbing pre-pass of a training-data pipeline
    (flag or route documents before redaction).

    Pure ``regexp_count`` projections — one codegen'd pass over the text
    column, zero shuffles, trivially partition-parallel. The pattern set is
    a *surface* detector (high recall pre-filter feeding a precise
    redactor), which is the part that must run at 100 TB.
    """
    counts = {
        k: F.regexp_count(F.col("text"), F.lit(p)).cast("bigint")
        for k, p in PII_PATTERNS.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return docs.select(
        "doc_id",
        *[counts[k].alias(f"n_{k}") for k in PII_PATTERNS],
        total.cast("bigint").alias("n_pii_total"),
    )


#: Redaction order. Deliberate: SSNs and IPv4s both lie inside the looser
#: phone pattern's language (e.g. "192.168.0.1" is 11 digit/dot chars — a
#: "phone"), so the precise patterns must consume their matches first;
#: emails go before ipv4/phone for the user@1.2.3.4 host form. Placeholders
#: contain no digits, so earlier replacements never create later matches.
PII_REDACT_ORDER = ("email", "ssn", "ipv4", "phone")


def pii_redact(docs: DataFrame) -> DataFrame:
    """PII redaction — the precise-replace stage after :func:`pii_scan`'s
    surface detection: each pattern's matches are replaced with a typed
    ``[KIND]`` placeholder, applied in :data:`PII_REDACT_ORDER` so
    overlapping pattern languages resolve deterministically. Per-kind
    counts are taken on the *progressively redacted* text — they report
    what this stage actually replaced (an SSN never double-counts as a
    phone), and the sequential semantics reproduce verbatim in the DuckDB
    oracle's nested ``regexp_replace`` calls.

    Pure codegen'd projections over the scan — zero shuffles, zero Python;
    at 100 TB this is the shape a scrubbing pass must have (the text
    column rewrites in place, no reassembly join).

    Output: (doc_id, n_email, n_ssn, n_ipv4, n_phone, text_redacted).
    """
    txt = F.col("text")
    counts = []
    for k in PII_REDACT_ORDER:
        pat = PII_PATTERNS[k]
        counts.append(F.regexp_count(txt, F.lit(pat)).cast("bigint").alias(f"n_{k}"))
        txt = F.regexp_replace(txt, pat, f"[{k.upper()}]")
    return docs.select("doc_id", *counts, txt.alias("text_redacted"))


def quality_filter(docs: DataFrame) -> DataFrame:
    """Composite C4/Gopher-style KEEP/DROP verdict with per-rule flags —
    the cleaning stage that consumes the signal operators. Rules (all
    integer cross-multiplications, no double thresholds, so every engine
    and every cluster size lands on identical verdicts):

    * ``flag_len``      — fewer than 10 tokens or more than 20,000 chars
      (C4 length bounds, collapsed to the corpus-relevant pair);
    * ``flag_symbols``  — punctuation+digit chars > 30% of all chars;
    * ``flag_nostop``   — ≥ 20 tokens but not one stopword (C4's "no
      terminal-punctuation/gibberish" proxy for this corpus class);
    * ``flag_rep2``     — tokens covered by the top word 2-gram > 20%
      (Gopher table A1);
    * ``flag_rep3``     — repeated 3-gram occurrences > 20% of all 3-gram
      occurrences (Gopher);
    * ``keep``          — no flag fired.

    Scale shape: the repetition aggregates are the same (doc_id, gram)
    map-side-combined shuffles as :func:`repetition_stats` (keys carry
    doc_id — no global hot gram); everything else is one codegen pass over
    the scan. Output: one row per document.
    """
    n_tokens = F.regexp_count(F.col("text"), F.lit(TOKEN_RE)).cast("bigint")
    n_chars = F.length("text").cast("bigint")
    n_stop = F.regexp_count(F.col("text"), F.lit(_word_re(STOPWORDS))).cast("bigint")
    n_punct = F.regexp_count(F.col("text"), F.lit(r"[^\w\s]")).cast("bigint")
    n_digit = F.regexp_count(F.col("text"), F.lit(r"[0-9]")).cast("bigint")

    g2 = (
        ngrams_all(docs, 2)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max2"))
    )
    g3 = (
        ngrams_all(docs, 3)
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("tot3"), F.count("*").alias("dst3"))
    )
    base = docs.select(
        "doc_id",
        n_tokens.alias("nt"),
        n_chars.alias("nc"),
        n_stop.alias("ns"),
        (n_punct + n_digit).alias("nsym"),
    )
    j = base.join(g2, "doc_id", "left").join(g3, "doc_id", "left")
    flag_len = (F.col("nt") < 10) | (F.col("nc") > 20000)
    flag_symbols = F.col("nsym") * 10 > F.col("nc") * 3
    flag_nostop = (F.col("nt") >= 20) & (F.col("ns") == 0)
    flag_rep2 = F.coalesce(
        F.col("max2") * 2 * 10 > F.col("nt") * 2, F.lit(False)
    )
    flag_rep3 = F.coalesce(
        (F.col("tot3") - F.col("dst3")) * 10 > F.col("tot3") * 2, F.lit(False)
    )
    return j.select(
        "doc_id",
        flag_len.alias("flag_len"),
        flag_symbols.alias("flag_symbols"),
        flag_nostop.alias("flag_nostop"),
        flag_rep2.alias("flag_rep2"),
        flag_rep3.alias("flag_rep3"),
        (~(flag_len | flag_symbols | flag_nostop | flag_rep2 | flag_rep3)).alias("keep"),
    )


def lm_score(docs: DataFrame) -> DataFrame:
    """Corpus-trained unigram language-model score per document (the
    classic KenLM-perplexity quality signal of CCNet-style pipelines,
    reduced to the add-one-smoothed unigram case so the whole model is
    one aggregation — no external model artifact).

    Model: ``P(t) = (C(t)+1) / (N+V)`` with ``C`` the corpus occurrence
    count, ``N`` total tokens, ``V`` vocabulary size. Score =
    average negative log-likelihood (lower = more corpus-typical); also
    emitted: ``n_hapax``, the count of this doc's tokens that occur
    exactly once in the whole corpus (an OOV-rate stand-in).

    Scale posture (100 TB): tokens are pre-aggregated per (doc_id, tok)
    map-side BEFORE the model join, so the shuffle carries distinct
    doc-term pairs, not token occurrences; the model join shuffles on
    ``tok`` (AQE splits the stopword-skewed keys); ``N``/``V`` ride a
    1-row broadcast. Engine parity: per-token log-probs are rounded to 6
    decimals and summed as DECIMAL (exact, order-free); the only
    cross-engine hazard is a 1-ulp ``ln`` difference landing exactly on a
    rounding boundary (~1e-9 per distinct token, measured).
    """
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    doc_tok = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("k"))
    counts = doc_tok.groupBy("tok").agg(F.sum("k").alias("c"))
    g = counts.agg(F.sum("c").alias("n_total"), F.count(F.lit(1)).alias("v"))
    lp = counts.crossJoin(F.broadcast(g)).select(
        "tok",
        "c",
        F.round(
            F.log(
                (F.col("c") + F.lit(1)).cast("double")
                / (F.col("n_total") + F.col("v")).cast("double")
            ),
            6,
        )
        .cast("decimal(18,6)")
        .alias("logp"),
    )
    return (
        doc_tok.join(lp, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_tokens"),
            F.sum(F.when(F.col("c") == 1, F.col("k")).otherwise(F.lit(0))).alias("n_hapax"),
            F.round(
                -F.sum(F.col("k") * F.col("logp")).cast("double") / F.sum("k"), 4
            ).alias("avg_nll"),
        )
    )


def tfidf_keywords(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the corpus-statistics
    keyword extractor (doc tagging / topic hints for data mixing).

    ``score = tf * round(ln(N/df), 6)`` with ``tf`` the in-doc occurrence
    count, ``df`` the containing-doc count and ``N`` the corpus document
    count (docs with >=1 token) — one rounded ``ln`` per DISTINCT token,
    everything else exact integer/DECIMAL arithmetic, so the scores (and
    the (score desc, token asc) top-k cut) are engine- and
    partitioning-exact.

    Scale: same shape as :func:`lm_score` — per-(doc,tok) map-side
    pre-aggregation, model join shuffled on ``tok`` (AQE skew-splits
    stopwords), ``N`` on a 1-row broadcast; the top-k is one window over
    doc-sized groups.
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    dt = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = dt.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    nd = dt.agg(F.countDistinct("doc_id").alias("n_docs"))
    idf = dfreq.crossJoin(F.broadcast(nd)).select(
        "tok",
        "df",
        F.round(F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")), 6)
        .cast("decimal(18,6)")
        .alias("idf"),
    )
    scored = dt.join(idf, "tok").select(
        "doc_id", "tok", "tf", "df", (F.col("tf") * F.col("idf")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "tok", "tf", "df", F.col("score").cast("double").alias("score"))
    )


def lm_score_bigram(docs: DataFrame) -> DataFrame:
    """Corpus-trained BIGRAM language-model score per document — the
    next step up from :func:`lm_score`'s unigram model (context-aware:
    "york new" scores far worse than "new york" even though the unigram
    model cannot tell them apart).

    Model: add-one-smoothed conditional ``P(t2|t1) = (C(t1,t2)+1) /
    (C(t1,·)+V)`` with ``C(t1,t2)`` the corpus bigram count, ``C(t1,·)``
    the count of t1 as a bigram LEFT context, and ``V`` the corpus
    unigram vocabulary size. Score = average negative log-likelihood
    over the doc's bigrams (docs with <2 tokens emit n_bigrams=0 and a
    NULL score); also emitted: ``n_unseen_ctx``, bigram occurrences
    whose pair appears exactly once corpus-wide (the OOV-rate stand-in).

    Scale posture (100 TB): bigrams are formed INSIDE the row by a pure
    array expression over the split tokens (transform over a sequence —
    zero shuffle, no window over token position), then pre-aggregated
    per (doc_id, bigram) map-side before the model join; the model join
    shuffles on the bigram key (AQE splits stopword-pair skew); V rides
    a 1-row broadcast. Engine parity: per-bigram log-probs are rounded
    to 6 decimals and summed as DECIMAL (exact, order-free) — the same
    contract as :func:`lm_score`.
    """
    # no lambda HOFs anywhere: transform()/filter() lambdas are interpreted
    # per element (25M evals stalled the 500k-doc bigscale run for minutes);
    # arrays_zip(slice, slice) is a codegen'd builtin. The trimmed \s+ split
    # yields an empty token ONLY for empty text, which has no bigram — so no
    # token filter is needed.
    arr = docs.select("doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("a"))
    bi = arr.select(
        "doc_id",
        F.explode(
            F.expr(
                "arrays_zip(slice(a, 1, greatest(size(a) - 1, 0)),"
                " slice(a, 2, greatest(size(a) - 1, 0)))"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.0").alias("t1"), F.col("bg.1").alias("t2"))
    doc_bi = bi.groupBy("doc_id", "t1", "t2").agg(F.count(F.lit(1)).alias("k"))
    cnt = doc_bi.groupBy("t1", "t2").agg(F.sum("k").alias("c"))
    ctx = cnt.groupBy("t1").agg(F.sum("c").alias("c_ctx"))
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    vocab = toks.agg(F.count_distinct("tok").alias("v"))
    lp = (
        cnt.join(ctx, "t1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "t1",
            "t2",
            "c",
            F.round(
                F.log(
                    (F.col("c") + F.lit(1)).cast("double")
                    / (F.col("c_ctx") + F.col("v")).cast("double")
                ),
                6,
            )
            .cast("decimal(18,6)")
            .alias("logp"),
        )
    )
    scored = (
        doc_bi.join(lp, ["t1", "t2"])
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.sum(F.when(F.col("c") == 1, F.col("k")).otherwise(F.lit(0))).alias(
                "n_unseen_ctx"
            ),
            F.round(
                -F.sum(F.col("k") * F.col("logp")).cast("double") / F.sum("k"), 4
            ).alias("avg_nll"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce(F.col("n_unseen_ctx"), F.lit(0)).cast("long").alias("n_unseen_ctx"),
            F.col("avg_nll"),
        )
    )


def top_ngrams(docs: DataFrame, n: int = 3, k: int = 20) -> DataFrame:
    """Corpus n-gram heavy hitters: the ``k`` word ``n``-grams appearing in
    the most distinct documents — the standard boilerplate/template
    detector for web-scale corpora (a phrase carried by thousands of
    documents is markup, licence text, or a scraper artifact, not
    language).

    Scale shape: per-doc n-grams by pure array math (split once, one
    sequence transform — no shuffle), ONE (doc_id, ngram) hash aggregate
    collapsing within-doc repeats map-side, one (ngram) aggregate for
    document frequency + total occurrences, then a global
    ``orderBy().limit(k)`` — Spark executes that as TakeOrdered (per-
    partition top-k + tiny driver merge), NOT a single-partition sort, so
    the full n-gram distribution is never materialized anywhere. The final
    rank window runs over k rows.

    Output: (rank, ngram, n_docs, n_occurrences), rank 1-based by
    (n_docs desc, ngram asc) — fully deterministic.
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    per_doc = (
        docs.select("doc_id", F.explode(grams).alias("ngram"))
        .groupBy("doc_id", "ngram")
        .agg(F.count(F.lit(1)).alias("n_in_doc"))
    )
    stats = per_doc.groupBy("ngram").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_in_doc").cast("long").alias("n_occurrences"),
    )
    top = stats.orderBy(F.col("n_docs").desc(), F.col("ngram").asc()).limit(k)
    w = Window.partitionBy(F.lit(1)).orderBy(F.col("n_docs").desc(), F.col("ngram").asc())
    return top.select(
        F.row_number().over(w).alias("rank"), "ngram", "n_docs", "n_occurrences"
    )


def bpe_pair_counts(docs: DataFrame, k: int = 20) -> DataFrame:
    """The first BPE merge step over the corpus (round 5): count adjacent
    CHARACTER pairs within whitespace words and rank the top ``k`` merge
    candidates — exactly the statistic a byte-pair-encoding tokenizer
    trainer computes each round (Sennrich et al. 2016; the full trainer
    iterates merge -> recount, and each round is this same aggregate over
    the progressively-merged symbol stream).

    Scale shape: split once, explode words, ONE in-row ``sequence``
    transform to the per-word pair array (no shuffle until the count),
    one (pair) hash aggregate with map-side combine, then a global
    ``orderBy().limit(k)`` — TakeOrdered, never a single-partition sort
    of the pair distribution. The rank window runs over k rows.

    Output: (rank, pair, n_occurrences), rank 1-based by
    (n_occurrences desc, pair asc) — fully deterministic.
    """
    from pyspark.sql import Window

    words = F.split(F.trim(F.col("text")), r"\s+")
    # w.substr(i, 2): 1-based adjacent char pair; length-<2 words filtered
    per_word = F.transform(
        F.filter(words, lambda w: F.length(w) >= 2),
        lambda w: F.transform(
            F.sequence(F.lit(1), F.length(w) - 1), lambda i: w.substr(i, F.lit(2))
        ),
    )
    stats = (
        docs.select(F.explode(F.flatten(per_word)).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).cast("long").alias("n_occurrences"))
    )
    top = stats.orderBy(F.col("n_occurrences").desc(), F.col("pair").asc()).limit(k)
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.col("n_occurrences").desc(), F.col("pair").asc()
    )
    return top.select(F.row_number().over(w).alias("rank"), "pair", "n_occurrences")
