"""IMRU — Iterative Map-Reduce-Update, Spark-native.

Reference contract (imru-core IIMRUJob.java:40-66, SURVEY.md §5.4): an
iteration broadcasts the current model to every data partition, maps the
partition's examples against it, reduces the per-partition partial
aggregates with an associative combiner (the reference builds an
aggregation tree), updates the model at the driver, and loops until
``should_terminate``. The shipped examples are k-means (KMeansJob.java:
69-126) and batch gradient descent (BGDJob.java:29-97).

Spark rendition: the model rides a broadcast variable; the map phase is
one ``mapInPandas`` pass emitting one pickled partial per Arrow batch
(vectorized numpy inside, never per-row Python); partials tree-reduce
via ``RDD.treeReduce`` (the reference's aggregation tree); the update
runs on the driver. Partial size must be O(model), independent of data
size — true for k-means (k x d sums + counts) and BGD (d gradient).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Any, Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


@dataclass
class IMRUResult:
    model: Any
    iterations: int
    converged: bool
    history: list[dict] = field(default_factory=list)


def imru_run(
    data: DataFrame,
    map_fn: Callable[[pd.DataFrame, Any], Any],
    reduce_fn: Callable[[Any, Any], Any],
    update_fn: Callable[[Any, Any], Any],
    model0: Any,
    max_iterations: int = 20,
    should_terminate: Callable[[Any, Any, int], bool] | None = None,
) -> IMRUResult:
    """Run the IMRU loop.

    map_fn(pdf, model) -> partial ; reduce_fn(partial, partial) ->
    partial (associative) ; update_fn(model, reduced) -> new model ;
    should_terminate(old_model, new_model, iteration) -> bool.
    """
    spark = data.sparkSession
    sc = spark.sparkContext
    data = data.persist()
    if data.count() == 0:
        # non-empty input guarantees at least one Arrow batch, hence at
        # least one partial — checked ONCE here, not per iteration (an
        # in-loop isEmpty() probe costs an extra uncached job per
        # iteration that re-runs the map pass)
        data.unpersist()
        raise ValueError(
            "imru_run: empty input — no Arrow batches would produce any partial"
        )

    import pyspark.sql.types as T

    partial_schema = T.StructType([T.StructField("partial", T.BinaryType(), False)])

    model = model0
    history: list[dict] = []
    converged = False
    it = 0
    for it in range(1, max_iterations + 1):
        bc = sc.broadcast(pickle.dumps(model))

        def map_partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            m = pickle.loads(bc.value)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                yield pd.DataFrame({"partial": [pickle.dumps(map_fn(pdf, m))]})

        partials = data.mapInPandas(map_partials, schema=partial_schema)
        # aggregation tree over per-batch partials (reference: the IMRU
        # reduce tree); partials are O(model) so depth-2 is plenty.
        reduced_bytes = partials.rdd.map(lambda r: r["partial"]).treeReduce(
            lambda a, b: pickle.dumps(reduce_fn(pickle.loads(a), pickle.loads(b))), depth=2
        )
        reduced = pickle.loads(reduced_bytes)
        new_model = update_fn(model, reduced)
        bc.destroy()
        history.append({"iteration": it})
        if should_terminate is not None and should_terminate(model, new_model, it):
            model = new_model
            converged = True
            break
        model = new_model

    data.unpersist()
    return IMRUResult(model=model, iterations=it, converged=converged, history=history)


# ---------------------------------------------------------------------
# Shipped examples (reference: KMeansJob, BGDJob)
# ---------------------------------------------------------------------

def kmeans(
    points: DataFrame,
    k: int,
    features_col: str = "features",
    max_iterations: int = 20,
    tol: float = 1e-9,
    init_centers: np.ndarray | None = None,
) -> IMRUResult:
    """K-means via IMRU. Deterministic: initial centers default to the
    feature vectors of the k lowest-id rows (order-free at any scale),
    assignment ties break to the lowest center index (numpy argmin).

    Model = (k x d) center matrix; partial = (k x d sums, k counts).
    """
    id_col = points.columns[0]
    if init_centers is None:
        first = (
            points.orderBy(id_col).limit(k).select(features_col).collect()
        )
        init_centers = np.array([list(r[0]) for r in first], dtype=np.float64)
    centers0 = np.asarray(init_centers, dtype=np.float64)

    def map_fn(pdf: pd.DataFrame, centers: np.ndarray):
        x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[features_col]])
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        sums = np.zeros_like(centers)
        counts = np.zeros(len(centers), dtype=np.int64)
        np.add.at(sums, assign, x)
        np.add.at(counts, assign, 1)
        return sums, counts

    def reduce_fn(a, b):
        return a[0] + b[0], a[1] + b[1]

    def update_fn(centers: np.ndarray, red):
        sums, counts = red
        new = centers.copy()
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz][:, None]
        return new

    def should_terminate(old, new, it):
        return float(np.abs(new - old).sum()) <= tol

    return imru_run(
        points.select(id_col, features_col),
        map_fn,
        reduce_fn,
        update_fn,
        centers0,
        max_iterations=max_iterations,
        should_terminate=should_terminate,
    )


def batch_gradient_descent(
    examples: DataFrame,
    features_col: str = "features",
    label_col: str = "label",
    dim: int | None = None,
    learning_rate: float = 0.1,
    max_iterations: int = 20,
    tol: float = 1e-9,
) -> IMRUResult:
    """Linear-regression BGD via IMRU (reference BGDJob): model = weight
    vector; partial = (gradient sum, example count, squared-error sum)."""
    if dim is None:
        dim = len(examples.select(features_col).first()[0])
    w0 = np.zeros(dim, dtype=np.float64)

    def map_fn(pdf: pd.DataFrame, w: np.ndarray):
        x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[features_col]])
        y = pdf[label_col].to_numpy(dtype=np.float64)
        err = x @ w - y
        grad = x.T @ err
        return grad, len(y), float(err @ err)

    def reduce_fn(a, b):
        return a[0] + b[0], a[1] + b[1], a[2] + b[2]

    def update_fn(w, red):
        grad, n, _ = red
        return w - learning_rate * grad / max(n, 1)

    def should_terminate(old, new, it):
        return float(np.abs(new - old).sum()) <= tol

    return imru_run(
        examples.select(features_col, label_col),
        map_fn,
        reduce_fn,
        update_fn,
        w0,
        max_iterations=max_iterations,
        should_terminate=should_terminate,
    )
