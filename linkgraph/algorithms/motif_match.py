"""Declarative motif pattern matching over the edge relation.

A tiny pattern language in the GraphFrames `find()` style — the general
query surface behind the fixed-shape motif operators (triangles,
wedges, triad census, rectangles):

    "(a)-[]->(b); (b)-[]->(c); !(a)-[]->(c)"

Positive terms bind variables to vertices connected by a directed edge;
``!``-prefixed terms are negations (the bound pair must NOT be an
edge). The result is one row per binding, one BIGINT column per
variable. The reference engine has no such surface (its only join is
the message⋈vertex id equi-join, SURVEY.md §3.3); ours compiles the
pattern to a chain of DataFrame equi-joins + left-anti joins, so
Catalyst owns join order/strategy and every match step is a plain
shuffled hash join on bound variables.

Edges can be NAMED — ``(a)-[e1]->(b)`` — which exposes every
non-src/dst column of the edge relation as ``e1_<col>`` output columns
and, crucially, makes edge MULTIPLICITY matter: a named term matches
each distinct attributed edge occurrence, so temporal-graph motifs are
one ``where`` clause away:

    motif_find(tedges, "(a)-[e1]->(b); (b)-[e2]->(c)",
               where="e2_t >= e1_t")      # time-respecting 2-chain

Unnamed terms keep pure existence semantics (the pair-distinct edge
relation), and negations always test pair existence.

Semantics (GraphFrames-compatible):
- named variables unify: the same name in two terms is the same vertex;
- DISTINCT names are NOT implicitly distinct vertices — add explicit
  inequality via ``where`` (e.g. ``"a != c"``);
- each positive term consumes one edge (pair-distinct if unnamed,
  row-distinct if named), so bindings are exact multiplicity-one rows
  (no DISTINCT pass needed).

Scale notes: every positive term after the first must share >= 1
variable with the already-bound set — a term that shares none is a
cross join and is rejected (pass ``allow_cross=True`` only when the
disconnected product is genuinely wanted and both sides are known
small). Two-edge paths through a vertex are the usual quadratic hub
hazard; ``max_degree`` excludes vertices whose total (in+out) degree
exceeds the cap from the whole match — the same exact, documented
pre-filter as link prediction's hub cap — so one 10^5-degree hub
cannot explode the wedge join at corpus scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM_RE = re.compile(r"^(!?)\((\w+)\)-\[(\w*)\]->\((\w+)\)$")


@dataclass(frozen=True)
class _Term:
    neg: bool
    a: str
    b: str
    ename: str = ""


def parse_pattern(pattern: str) -> list[_Term]:
    """Parse "; "-separated terms of the form ``(x)-[]->(y)``,
    ``(x)-[e1]->(y)`` (named edge), or ``!(x)-[]->(y)`` (negation).
    Raises ValueError on malformed input."""
    terms = []
    names = set()
    for raw in pattern.split(";"):
        raw = raw.strip()
        if not raw:
            continue
        m = _TERM_RE.match(raw)
        if not m:
            raise ValueError(f"malformed motif term: {raw!r}")
        neg, a, ename, b = m.groups()
        if a == b:
            raise ValueError(f"self-loop term not supported: {raw!r}")
        if neg and ename:
            raise ValueError(f"negated term cannot name its edge: {raw!r}")
        if ename:
            if ename in names:
                raise ValueError(f"duplicate edge name: {ename!r}")
            names.add(ename)
        terms.append(_Term(neg=bool(neg), a=a, b=b, ename=ename))
    if not any(not t.neg for t in terms):
        raise ValueError("pattern needs at least one positive term")
    vnames = {t.a for t in terms} | {t.b for t in terms}
    if vnames & names:
        raise ValueError("edge names must not collide with vertex names")
    return terms


def motif_find(
    edges: DataFrame,
    pattern: str,
    where: str | None = None,
    max_degree: int | None = None,
    allow_cross: bool = False,
) -> DataFrame:
    """Match ``pattern`` against the directed edge relation.

    Returns DF(<var> BIGINT, ...) — one column per pattern variable in
    sorted name order, one row per binding. ``where`` is an optional
    SQL predicate over the variables applied after matching (negated
    terms included). See module doc for semantics and the
    ``max_degree`` hub cap.
    """
    terms = parse_pattern(pattern)
    attrs = [c for c in edges.columns if c not in ("src", "dst")]
    named = any(t.ename for t in terms)
    # pair-distinct relation for existence semantics; full-row distinct
    # only when a named term actually needs edge attributes
    e = edges.select("src", "dst").distinct()
    ea = edges.select("src", "dst", *attrs).distinct() if named and attrs else e
    if max_degree is not None:
        deg = (
            e.select(F.col("src").alias("id"))
            .unionAll(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("_d"))
            .filter(F.col("_d") <= max_degree)
            .select("id")
        )
        e = (
            e.join(deg.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(deg.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
        if ea is not e:
            ea = ea.join(e, ["src", "dst"], "left_semi")
    pos = [t for t in terms if not t.neg]
    neg = [t for t in terms if t.neg]
    if len(pos) + len(neg) > 1:
        e = e.persist()

    def term_df(t: _Term) -> DataFrame:
        if t.ename:
            return ea.select(
                F.col("src").alias(t.a),
                F.col("dst").alias(t.b),
                *[F.col(c).alias(f"{t.ename}_{c}") for c in attrs],
            )
        return e.select(F.col("src").alias(t.a), F.col("dst").alias(t.b))

    out = term_df(pos[0])
    bound = {pos[0].a, pos[0].b}
    pending = pos[1:]
    while pending:
        # pick the next term sharing a variable (order-independent
        # result; the greedy pick just avoids spurious cross-join
        # rejections for patterns listed out of chain order)
        idx = next(
            (i for i, t in enumerate(pending) if bound & {t.a, t.b}), None
        )
        if idx is None:
            if not allow_cross:
                raise ValueError(
                    "pattern is disconnected (cross join); pass "
                    "allow_cross=True if that is intended"
                )
            idx = 0
        t = pending.pop(idx)
        shared = sorted(bound & {t.a, t.b})
        if shared:
            out = out.join(term_df(t), on=shared)
        else:
            out = out.crossJoin(term_df(t))
        bound |= {t.a, t.b}
    for t in neg:
        if not {t.a, t.b} <= bound:
            raise ValueError(
                f"negated term !({t.a})-[]->({t.b}) uses unbound variables"
            )
        out = out.join(term_df(t), on=[t.a, t.b], how="left_anti")
    if where:
        out = out.filter(where)
    ecols = sorted(
        f"{t.ename}_{c}" for t in pos if t.ename for c in attrs
    )
    out = out.select(*sorted(bound), *ecols)
    # release the cache registration; the plan re-reads the (narrow)
    # projection if the action outlives it (khop convention)
    e.unpersist()
    return out
