"""Text analysis over a documents table — all JVM-side built-ins
(no Python in the hot path), each expressible in ANSI SQL for the
oracle gate.

Operates on any DF with (doc_id BIGINT, text STRING).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# tiny deterministic stopword list shared with the oracle SQL
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return docs.select("doc_id", F.size(_tokens()).alias("n_tokens"))


def quality_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars, stop_ratio, avg_token_len, quality)

    Heuristic quality scoring: stopword ratio + mean token length +
    length band. Deterministic, rounded to 6dp for cross-engine compare.
    """
    toks = _tokens()
    stop_arr = "array({})".format(",".join(f"'{w}'" for w in STOPWORDS))
    n_stop = F.size(F.expr(f"filter(split(text, ' '), t -> array_contains({stop_arr}, t))"))
    n_tok = F.size(toks)
    avg_len = F.expr(
        "aggregate(split(text, ' '), 0L, (acc, t) -> acc + length(t))"
    ) / n_tok
    stop_ratio = n_stop / n_tok
    quality = (
        F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(0.5)).otherwise(F.lit(0.0))
        + F.when((stop_ratio > 0.01) & (stop_ratio < 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when((avg_len > 2.0) & (avg_len < 12.0), F.lit(0.2)).otherwise(F.lit(0.0))
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.length("text").alias("n_chars"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(quality, 6).alias("quality"),
    )


def quality_key(docs: DataFrame) -> DataFrame:
    """(doc_id, q10 INT) — the :func:`quality_score` heuristic as an
    INTEGER key in tenths (5/3/2 points for the length / stopword-ratio
    / token-length bands), with every band test spelled as an integer
    compare (``n_stop/n_tok > 0.01`` ⟺ ``100*n_stop > n_tok`` etc.) so
    ranking by quality is exact in any engine — no float division, no
    ROUND ties. ``q10 == CAST(10*quality AS INT)`` of quality_score.
    """
    toks = _tokens()
    stop_arr = "array({})".format(",".join(f"'{w}'" for w in STOPWORDS))
    n_stop = F.size(F.expr(f"filter(split(text, ' '), t -> array_contains({stop_arr}, t))"))
    n_tok = F.size(toks)
    sum_len = F.expr("aggregate(split(text, ' '), 0L, (acc, t) -> acc + length(t))")
    q10 = (
        F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(5)).otherwise(F.lit(0))
        + F.when(
            (100 * n_stop > n_tok) & (10 * n_stop < 6 * n_tok), F.lit(3)
        ).otherwise(F.lit(0))
        + F.when(
            (sum_len > 2 * n_tok) & (sum_len < 12 * n_tok), F.lit(2)
        ).otherwise(F.lit(0))
    )
    return docs.select("doc_id", q10.cast("int").alias("q10"))


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — n-gram/stopword heuristic language ID:
     'en' when English stopword density clears a threshold."""
    stop_arr = "array({})".format(",".join(f"'{w}'" for w in STOPWORDS))
    ratio = F.size(
        F.expr(f"filter(split(text, ' '), t -> array_contains({stop_arr}, t))")
    ) / F.size(_tokens())
    return docs.select(
        "doc_id",
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


def vocabulary(docs: DataFrame, top_k: int = 50) -> DataFrame:
    """(term, tf, df) — corpus vocabulary: the ``top_k`` terms by
    document frequency (ties: total frequency desc, then term asc).

    The 100 TB shape: one explode + one groupBy (Spark plans the
    count-distinct as a two-round partial aggregate, so per-term state
    stays bounded), and the top-k is a TakeOrdered over the aggregated
    term table — no global sort of the token stream.
    """
    terms = docs.select(
        "doc_id", F.explode(_tokens()).alias("term")
    ).filter(F.col("term") != "")
    return (
        terms.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
        .orderBy(F.col("df").desc(), F.col("tf").desc(), F.col("term"))
        .limit(top_k)
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fingerprint) — stable 64-bit-ish content fingerprint
    (hex prefix of md5; identical in any engine with md5)."""
    return docs.select(
        "doc_id", F.substring(F.md5(F.col("text")), 1, 16).alias("fingerprint")
    )


# BPE-style pre-tokenization, simplified to an engine-portable regex:
# letter runs, digit runs, and single punctuation marks each count as
# one subtoken (the GPT-2 pre-tokenizer split shape). Only the ASCII
# space is treated as whitespace so Spark (Java regex) and the DuckDB
# oracle (RE2) count identically.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def tfidf_top_terms(docs: DataFrame, top_k: int = 5) -> DataFrame:
    """(doc_id, term, tf, score) — each document's ``top_k`` terms by
    smoothed TF-IDF (idf = ln((N+1)/(df+1)) + 1, score = tf*idf rounded
    to 6dp BEFORE ranking so the order is engine-independent; ties break
    on term asc).

    The 100 TB shape: one explode + a (doc_id, term) partial/final
    count, a per-term df aggregate (small — vocabulary-sized) that
    re-joins on term, the corpus size as a broadcast one-row aggregate
    (no driver-side count), and a per-document window for the top-k —
    partitioned by doc_id, so each task ranks only its own documents'
    terms. No global sort, no collect.
    """
    terms = docs.select(
        "doc_id", F.explode(_tokens()).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf is unique per (doc, term), so df is a plain count over it
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + 1.0),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .drop("rn")
    )


# normalization regex shared (verbatim) with the DuckDB oracle: Java
# regex and RE2 agree on this pattern — ASCII classes only
NORM_PATTERN = "[^a-z0-9]+"


def normalize_text(docs: DataFrame) -> DataFrame:
    """(doc_id, norm_text, norm_fingerprint) — canonical pre-dedup
    normalization: lowercase, collapse every non-alphanumeric run to a
    single space, trim; fingerprint = 16-hex-char md5 prefix of the
    normalized text. One whole-stage-codegen scan (lower +
    regexp_replace + trim + md5 are all JVM built-ins), so it runs at
    parquet-read speed at any corpus size. Composes with
    :func:`~linkgraph.pipeline.dedup.exact_duplicates` for
    normalization-invariant exact dedup."""
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), NORM_PATTERN, " "))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.substring(F.md5(norm), 1, 16).alias("norm_fingerprint"),
    )


def contamination_check(docs: DataFrame, probes: DataFrame) -> DataFrame:
    """(doc_id, n_hits, contaminated) — benchmark decontamination:
    flag documents containing any probe string (the exact-substring
    tier of eval-set contamination checking; probes are benchmark
    n-grams/answers).

    ``probes`` must have a ``probe`` STRING column. The probe set is
    small relative to the corpus (benchmarks are KBs, the corpus is
    TBs), so it broadcasts: the plan is a BroadcastNestedLoopJoin that
    streams the corpus once — per-doc cost is len(probes) substring
    scans, JVM-side ``contains``, no shuffle of the text column. The
    groupBy shuffles only (doc_id, tiny int) pairs.
    """
    hits = docs.crossJoin(F.broadcast(probes.select("probe"))).select(
        "doc_id",
        F.col("text").contains(F.col("probe")).cast("int").alias("hit"),
    )
    return hits.groupBy("doc_id").agg(
        F.sum("hit").alias("n_hits"),
        (F.sum("hit") > 0).cast("int").alias("contaminated"),
    )


def ngram_decontaminate(
    docs: DataFrame, probes: DataFrame, n: int = 8, portable: bool = False
) -> DataFrame:
    """(doc_id, n_matched_ngrams, max_run_len, contaminated) — the
    n-gram-overlap tier of benchmark decontamination (the industry
    default is 8-13-gram overlap; :func:`contamination_check` is the
    exact-substring tier). A corpus document is flagged when any of its
    word n-grams also appears in the probe suite; the output carries
    both the total matched-position count and the longest CONSECUTIVE
    run of matched positions (a long run means a verbatim excerpt, not
    coincidental phrase reuse).

    ``probes`` must have a ``probe`` STRING column (benchmark
    documents / answer strings — tokenized with the same whitespace
    rule as the corpus).

    100 TB shape: the probe suite's distinct n-gram set is tiny
    relative to the corpus (benchmarks are MBs), so it BROADCASTS and
    the corpus streams once through a posexplode + broadcast semi-join
    — the text column never shuffles. Only MATCHED (doc_id, pos) rows
    (O(contamination), near-zero on a clean corpus) reach the run-length
    window, which partitions by doc_id. In the production default the
    join key is xxhash64 of the n-gram (8 bytes broadcast per probe
    n-gram, one cheap hash per corpus position); ``portable=True`` joins
    the raw n-gram strings so the DuckDB oracle reproduces the result
    verbatim — identical output either way up to 64-bit collisions.
    """
    # if(): sequence(1, 0) DESCENDS in Spark ([1,0]) and slice then
    # hits index 0 — docs/probes shorter than n need an explicit empty array
    shingle = F.expr(
        f"transform(if(size(toks) < {n}, array(), sequence(1, size(toks) - {n - 1})),"
        f" i -> concat_ws(' ', slice(toks, i, {n})))"
    )
    key = (lambda c: F.col(c)) if portable else (lambda c: F.xxhash64(F.col(c)))
    corpus = (
        docs.select("doc_id", F.split("text", " ").alias("toks"))
        .select("doc_id", F.posexplode(shingle).alias("pos", "sh"))
        .select("doc_id", (F.col("pos") + 1).alias("pos"), key("sh").alias("k"))
    )
    probe_sh = (
        probes.select(F.split("probe", " ").alias("toks"))
        .select(F.explode(shingle).alias("sh"))
        .select(key("sh").alias("k"))
        .distinct()
    )
    matched = corpus.join(F.broadcast(probe_sh), "k", "left_semi")
    # longest consecutive run: positions grouped by (pos - row_number)
    w = Window.partitionBy("doc_id").orderBy("pos")
    runs = (
        matched.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
        .groupBy("doc_id")
        .agg(
            F.sum("run").alias("n_matched_ngrams"),
            F.max("run").alias("max_run_len"),
        )
    )
    return docs.select("doc_id").join(runs, "doc_id", "left_outer").select(
        "doc_id",
        F.coalesce("n_matched_ngrams", F.lit(0)).cast("long").alias("n_matched_ngrams"),
        F.coalesce("max_run_len", F.lit(0)).cast("long").alias("max_run_len"),
        (F.coalesce("n_matched_ngrams", F.lit(0)) > 0).cast("int").alias("contaminated"),
    )


# PII patterns shared VERBATIM with the DuckDB oracle — ASCII classes,
# bounded quantifiers, no backrefs/lookaround, so Java regex (Spark) and
# RE2 (DuckDB) match identically. Spark's regexp_replace is global by
# default; the oracle must pass the 'g' flag.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PII_PHONE = "\\+?[0-9][0-9 ()-]{7,}[0-9]"


def pii_redact(docs: DataFrame) -> DataFrame:
    """(doc_id, redacted_text, n_emails, n_ips, n_phones) — PII scrub
    for training corpora: emails, IPv4 addresses, then phone-shaped
    digit runs are replaced by typed placeholder tokens, in that fixed
    order (each count is taken on the text AS THE PREVIOUS STAGE LEFT
    IT, so counts and replacements always agree — an email's digits can
    never double-count as a phone).

    One whole-stage-codegen scan: lower-level regexp_replace /
    regexp_count built-ins only, no Python, no shuffle — runs at
    parquet-read speed at any corpus size and composes with
    normalize/dedup stages.
    """
    t0 = F.col("text")
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        t3.alias("redacted_text"),
        F.regexp_count(t0, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t1, F.lit(PII_IPV4)).cast("long").alias("n_ips"),
        F.regexp_count(t2, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, dup_word_frac, top2gram_frac, top3gram_frac)
    — Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    the fraction of tokens that are repeats of an earlier token, and the
    fraction of the document covered by its single most frequent word
    2-gram / 3-gram. High values mean degenerate, loopy text a training
    pipeline should drop.

    Definitions (engine-portable, deterministic):
    - dup_word_frac  = 1 - distinct_tokens / n_tokens
    - topKgram_frac  = K * max_count(K-gram) / n_tokens  (0 when the
      doc has fewer than K tokens)

    100 TB shape: one explode per K plus partial/final counts keyed by
    (doc_id, gram) — per-doc state, no global vocabulary, no window
    over the token stream; the max-per-doc is a second tiny aggregate
    over (doc_id, gram, count) rows.
    """
    toks = docs.select("doc_id", F.split("text", " ").alias("toks")).select(
        "doc_id",
        F.expr("filter(toks, t -> t <> '')").alias("toks"),
    )
    base = toks.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )

    def top_gram(k: int, name: str) -> DataFrame:
        gram = F.expr(
            f"transform(if(size(toks) < {k}, array(), sequence(1, size(toks) - {k - 1})),"
            f" i -> concat_ws(' ', slice(toks, i, {k})))"
        )
        return (
            toks.select("doc_id", F.explode(gram).alias("g"))
            .groupBy("doc_id", "g")
            .agg(F.count(F.lit(1)).alias("c"))
            .groupBy("doc_id")
            .agg(F.max("c").alias(name))
        )

    return (
        base.join(top_gram(2, "m2"), "doc_id", "left_outer")
        .join(top_gram(3, "m3"), "doc_id", "left_outer")
        .selectExpr(
            "doc_id",
            "n_tokens",
            "ROUND(CASE WHEN n_tokens > 0"
            " THEN 1.0D - n_distinct / CAST(n_tokens AS DOUBLE)"
            " ELSE 0.0D END, 6) AS dup_word_frac",
            "ROUND(COALESCE(2.0D * m2 / n_tokens, 0.0D), 6) AS top2gram_frac",
            "ROUND(COALESCE(3.0D * m3 / n_tokens, 0.0D), 6) AS top3gram_frac",
        )
    )


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_subtokens) — whitespace token count plus a
    BPE-ish subtoken count from :data:`BPE_PATTERN`. Both are one
    JVM-side expression over the text column (no Python), so the scan
    stays a single whole-stage-codegen pass at any corpus size."""
    return docs.select(
        "doc_id",
        F.size(_tokens()).alias("n_tokens"),
        F.size(
            F.expr(f"regexp_extract_all(text, '{BPE_PATTERN}', 0)")
        ).cast("long").alias("n_subtokens"),
    )


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, n_matched, score) — Okapi BM25 relevance of every
    document against a bag of query terms (Robertson/Zaragoza), the
    standard retrieval scorer a training-data pipeline uses for
    quality-targeted corpus selection and eval-set retrieval audits.

    ``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Lucene's
    non-negative form); per-term contribution
    ``idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))``.

    Cross-engine determinism: each per-(doc, term) contribution is a
    pure scalar expression over exact integers (tf, df, dl) plus one
    corpus scalar (avgdl = exact-int sum / exact-int count, a single
    IEEE division), rounded to micro-units and cast to BIGINT *before*
    the per-document sum — so the only cross-row float reduction in the
    plan is an exact integer sum, immune to summation order. The DuckDB
    oracle mirrors the expression token for token.

    100 TB shape: tokenize + filter against a literal array (no probe
    shuffle), one (doc_id, term) partial/final count restricted to
    query terms (output ∝ matching docs × |q|), a |q|-row df aggregate
    and a 1-row corpus aggregate both broadcast back, one final
    per-document aggregate. Nothing wide ever shuffles — every exchange
    carries counts keyed by doc_id or term, never text. The pruned
    (doc_id, text) scan is recomputed for each derived aggregate (tf,
    df, dl, avgdl — same shape as :func:`tfidf_top_terms`); a
    production run over 100 TB materializes the tokenized ``tf``/``dl``
    count frames once (they are corpus-cardinality, not corpus-volume)
    to make it single-pass. Returns every document matching >= 1 query
    term; compose with ``orderBy(desc("score")).limit(k)``
    (TakeOrdered) for top-k.
    """
    q_arr = "array({})".format(",".join(f"'{t}'" for t in sorted(set(query_terms))))
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term")).filter(
        F.col("term") != ""
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.expr(f"array_contains({q_arr}, term)"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    contrib = (
        tf.join(F.broadcast(df), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.expr(
                "CAST(ROUND("
                " ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)"
                "           / (CAST(df AS DOUBLE) + 0.5))"
                f" * (CAST(tf AS DOUBLE) * ({k1!r} + 1.0))"
                f" / (CAST(tf AS DOUBLE) + {k1!r} * (1.0 - {b!r}"
                f"    + {b!r} * CAST(dl AS DOUBLE) / avgdl))"
                " * 1000000.0) AS BIGINT)"
            ).alias("c_micro"),
        )
    )
    return contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matched"),
        F.round(F.sum("c_micro").cast("double") / 1000000.0, 6).alias("score"),
    )


def unigram_lm_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — per-document mean token
    log-probability under the corpus's own unigram language model (the
    CCNet-style LM quality filter: low avg_logprob = rare-token soup /
    boilerplate; high = head-vocabulary prose). Documents with zero
    non-empty tokens carry no probability mass and are omitted.

    Cross-engine determinism: the model is exact integer counts;
    ``ll_micro(t) = BIGINT(ROUND(ln(cnt/total) * 1e6))`` is one scalar
    double expression per DISTINCT term (vocabulary-sized), after which
    the per-document reduction ``SUM(tf * ll_micro)`` is exact integer
    arithmetic — no float summation-order dependence. The final mean is
    one division pair in fixed order, rounded to 6dp.

    100 TB shape: one (doc_id, term) partial/final count, one
    vocabulary-sized term-count aggregate re-broadcast onto it, one
    per-document aggregate. Every exchange carries (id, count) rows,
    never text; the pruned (doc_id, text) scan recomputes under the
    model branch and the scoring branch (materialize the ``tf`` count
    frame once at production scale to make it single-pass).
    """
    toks = docs.select("doc_id", F.explode(_tokens()).alias("term")).filter(
        F.col("term") != ""
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    model = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    total = model.agg(F.sum("cnt").alias("total"))
    ll = model.crossJoin(F.broadcast(total)).select(
        "term",
        F.expr(
            "CAST(ROUND(ln(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))"
            " * 1000000.0) AS BIGINT)"
        ).alias("ll_micro"),
    )
    return (
        tf.join(F.broadcast(ll), "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("ll_micro")).alias("sll"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                F.col("sll").cast("double")
                / 1000000.0
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("avg_logprob"),
        )
    )
