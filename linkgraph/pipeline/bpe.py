"""Distributed BPE merge learning over the document corpus.

Byte-pair encoding (Sennrich et al. 2016) is the canonical subword
tokenizer trainer for LLM pipelines. The classic formulation is
sequential, but its state factors through the WORD-TYPE table: merge
decisions depend only on (word, frequency), so a 100 TB corpus
collapses to one explode + groupBy (vocabulary-sized, ~10^7-10^8 rows)
and the merge loop never touches the corpus again. Each round is

    1. adjacent-pair counts over the symbol sequences, weighted by
       word frequency — one small shuffle on (left, right);
    2. argmax pair — a 1-row driver action (the IMRU shape: kmeans
       collects k centroids per round, BPE collects one pair);
    3. apply the merge to every word — a map-only string rewrite.

The reference engine has no tokenizer trainer; this operator exists
for the training-data-pipeline tier (SURVEY.md LLM-ops section), next
to the regex `bpe_token_count` heuristic in textstats.py.

Exactness / oracle story: words are restricted to ``^[a-z]+$`` tokens
(documented contract — the separator and end-marker then cannot
collide), and symbol sequences are stored as strings with a DOUBLED
separator at every symbol boundary (``••a••b••c••``) plus a ``</w>``
end-of-word symbol. A merge of pair (l, r) is then the single
replace-all ``SEP+l+SEP+SEP+r+SEP -> SEP+l+r+SEP``: each match
consumes exactly ONE separator from each boundary it touches, leaving
the other for the neighboring occurrence, so one left-to-right
replace-all pass is EXACTLY the greedy BPE scan — including runs of
identical symbols (``aaaaaaaa`` under merge (a,a) pairs up positions
1-2/3-4/5-6/7-8, where a single-separator encoding would misalign to
1-2/4-5/7-8). After the pass no pattern occurrence can remain (any
leftover adjacent (l, r) would itself have been matched), so the pass
is the fixpoint. Both the Spark engine and the DuckDB oracle
(__spark_entry__._bpe_sql) run this identical rewrite, so the gate
compares two implementations of the same exact function — and the
pytest checks it against the textbook sequential algorithm.

Ties in the argmax break deterministically: count DESC, left ASC,
right ASC (byte-wise on ASCII — identical in Spark and DuckDB).

Reference parity note: nearest reference analogue is the IMRU model
loop (imru/ IMRUJobControl — broadcast model, aggregate update);
cited for shape, no tokenizer exists there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..superstep import local_checkpoint_fresh_stats

SEP = "\x1f"
END = "</w>"

_WORD_RE = "^[a-z]+$"


def _word_types(docs: DataFrame) -> DataFrame:
    """(word, freq) — lowercase-alpha token types with corpus counts.

    This is the ONLY pass over the corpus; everything after runs on
    the vocabulary-sized table.
    """
    return (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.col("word").rlike(_WORD_RE))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """(word, sym, freq) — sym is the character split joined with
    DOUBLED separators (``••t••h••e••</w>••``): every symbol boundary
    carries two separators so that one replace-all merge pass can
    consume one from each side and stay exactly left-greedy (module
    docstring)."""
    return words.select(
        "word",
        F.concat(
            F.lit(SEP + SEP),
            F.regexp_replace(F.col("word"), "(.)", "$1" + SEP + SEP),
            F.lit(END + SEP + SEP),
        ).alias("sym"),
        "freq",
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """(l, r, cnt) — adjacent symbol pairs weighted by word frequency.

    Counts POSITIONS (standard BPE: 'aaa' holds two (a,a) positions
    even though one merge application consumes both) — the oracle
    counts the same way.
    """
    return (
        state.select(
            F.expr(f"filter(split(sym, '{SEP}'), x -> x <> '')").alias("a"),
            "freq",
        )
        .select(
            F.expr(
                "explode(zip_with(slice(a, 1, size(a) - 1),"
                " slice(a, 2, size(a) - 1),"
                " (x, y) -> struct(x AS l, y AS r)))"
            ).alias("p"),
            "freq",
        )
        .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "freq")
        .groupBy("l", "r")
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    # one pass == greedy scan under the doubled-separator encoding
    pat = F.lit(SEP + left + SEP + SEP + right + SEP)
    rep = F.lit(SEP + left + right + SEP)
    return state.select(
        "word", F.replace(F.col("sym"), pat, rep).alias("sym"), "freq"
    )


def learn_bpe(
    docs: DataFrame, num_merges: int = 12
) -> tuple[list[tuple[int, str, str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges.

    Returns (merges, final_state): merges is the learned table as
    driver-side rows (round, l, r, merged, pair_count) — O(num_merges)
    rows, the model, exactly what IMRU-style loops hold on the driver —
    and final_state is the distributed (word, sym, freq) table after
    all merges (the subword vocabulary, used by the encoder).

    Raises ValueError if the corpus runs out of adjacent pairs before
    ``num_merges`` rounds (loud failure, house rule — the unrolled
    oracle would otherwise silently under-produce).
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    state = _init_symbols(_word_types(docs)).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, num_merges + 1):
        best = (
            _pair_counts(state)
            .orderBy(F.col("cnt").desc(), F.col("l"), F.col("r"))
            .limit(1)
            .collect()
        )
        if not best:
            raise ValueError(
                f"corpus exhausted after {rnd - 1} merges; "
                f"asked for {num_merges}"
            )
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rnd, l, r, l + r, cnt))
        state = local_checkpoint_fresh_stats(_apply_merge(state, l, r))
    return merges, state


def bpe_merges(docs: DataFrame, num_merges: int = 12) -> DataFrame:
    """The learned merge table as a DataFrame:
    (round, l, r, merged, pair_count), round-ordered."""
    spark = docs.sparkSession
    merges, _ = learn_bpe(docs, num_merges)
    return spark.createDataFrame(
        merges, "round bigint, l string, r string, merged string, pair_count bigint"
    )


def bpe_token_counts(docs: DataFrame, num_merges: int = 12) -> DataFrame:
    """(doc_id, n_bpe_tokens) — encode the corpus with the learned
    merges and count subword tokens per document.

    100 TB shape: the final (word -> symbol-count) table is
    vocabulary-sized, so the encode is a BROADCAST join against the
    exploded corpus — the corpus streams once, no shuffle of text.
    Documents with no ``^[a-z]+$`` token count 0.
    """
    _, state = learn_bpe(docs, num_merges)
    word_tokens = state.select(
        "word",
        F.expr(f"size(filter(split(sym, '{SEP}'), x -> x <> ''))")
        .cast("long")
        .alias("n_sym"),
    )
    corpus = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word").rlike(_WORD_RE))
    per_doc = (
        corpus.join(F.broadcast(word_tokens), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_sym").alias("n_bpe_tokens"))
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bpe_tokens", F.lit(0)).cast("long").alias("n_bpe_tokens"),
        )
    )
