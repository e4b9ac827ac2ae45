"""Token co-occurrence graph builder — corpus in, edge list out.

Beyond-reference pipeline operator: turns a documents table
(doc_id BIGINT, text STRING) into a weighted token-token graph — an
edge (u, v, n_docs) for every pair of distinct kept tokens that
co-occur in at least ``min_count`` documents. This is the bridge from
the text pipeline to the graph engine: the output feeds pagerank /
communities / MSF the same way the derived doc graph does (keyword
centrality, topic clusters, phrase maps).

Execution shape: one explode to distinct (doc_id, term) incidence, a
term-keyed document-frequency aggregate, then ONE self-equi-join of
the df-filtered incidence on doc_id and a pair groupBy — the same
center self-join as cocitation.py with the document as the center.

Scale notes:
- ``max_df`` is the hub cap, and here it is not optional in spirit: a
  stopword appearing in most of a 100 TB corpus would join with every
  other token in nearly every document (the pair count degenerates to
  quadratic-in-vocabulary times corpus size). Dropping high-df terms
  FIRST removes virtually all pair volume — the standard construction
  (it is also why the cap is an exact, oracle-sharable filter, not an
  approximation: the result is defined over the kept vocabulary).
- per-document pair volume is quadratic in the doc's kept-token count,
  bounded by doc length; the shuffles are one exchange on doc_id and
  one on the pair key.
- ``min_df`` removes hapax noise map-side before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_cooccurrence(
    docs: DataFrame,
    min_df: int = 2,
    max_df: int | None = None,
    min_count: int = 2,
) -> DataFrame:
    """DF(u, v, n_docs), u < v lexicographically: document-level
    co-occurrence counts over whitespace tokens kept when their
    document frequency lies in [``min_df``, ``max_df``] (``None`` =
    no upper cap — only safe on small corpora; see module docstring).
    Pairs sharing fewer than ``min_count`` documents are pruned."""
    dt = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    dfc = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    cond = F.col("df") >= min_df
    if max_df is not None:
        cond = cond & (F.col("df") <= max_df)
    kept = dt.join(dfc.filter(cond).select("term"), "term")

    left = kept.select("doc_id", F.col("term").alias("u"))
    right = kept.select("doc_id", F.col("term").alias("v"))
    pairs = (
        left.join(right, "doc_id")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
    if min_count > 1:
        pairs = pairs.filter(F.col("n_docs") >= min_count)
    return pairs
