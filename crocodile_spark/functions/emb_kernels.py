"""Bit-exact Arrow twins of the native embedding HOF laws (r8).

Spark higher-order functions (``aggregate``/``zip_with``) are
CodegenFallback -- interpreted per row, per element -- which made the
embedding dot products the dominant execution cost of the cosine/ANN
queries (guide section 4.2: measured 4.4 s of 4.5 s for the sf0.1
brute-force cosine sweep) and, for plan-literal centroid/hyperplane
forms, a multi-second Catalyst/codegen cost per query on top.

These kernels are NOT the usual "numerically close" numpy rewrite: every
reduction is a LEFT FOLD over the array dimension, vectorized across the
batch axis only::

    for j in range(dim):            # same element order as F.aggregate
        dot += A[:, j] * B[:, j]    # one rounded mul + one rounded add

Each element step performs exactly the two IEEE-754 double operations
(round(x*y), then round(acc+that)) that the interpreted
``aggregate(zip_with(a, b, ...), 0.0, acc + x)`` law performs, in the
same order, so results are bit-identical to the native expressions --
and therefore to the DuckDB oracles that replay the sequential
summation (``list_cosine_similarity`` / ``list_inner_product``). numpy
elementwise ops are IEEE-correctly-rounded per element and do not
contract mul+add into an FMA, so SIMD does not change the result. This
is what lets the DRIVER-GATED queries use the fast path: no
summation-order caveat exists, unlike the pairwise-summation matmul
twins (``M @ C.T``) which remain the production default for top-k
sweeps.

Null/edge laws replicated from ``functions.similarity.cosine_similarity``:
null array or null element -> 0.0; equal-width zero-norm -> 0.0; width
mismatch with positive norms -> NULL (zip_with pads with nulls, nulling
only the dot); NaN values propagate (Spark orders NaN above all numbers,
so ``na > 0`` is true for NaN norms).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def fold_dots(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, d) x (k, d) -> (n, k) dot products, left-fold over d.

    Bit-identical to k interpreted ``aggregate(zip_with(emb, c, x*y),
    0.0, acc + x)`` evaluations per row (same per-element op order)."""
    n = M.shape[0]
    acc = np.zeros((n, C.shape[0]), dtype=np.float64)
    for j in range(M.shape[1]):
        acc += M[:, j : j + 1] * C[None, :, j]
    return acc


def _fold_cosine_mat(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    n, d = A.shape
    dot = np.zeros(n, dtype=np.float64)
    na = np.zeros(n, dtype=np.float64)
    nb = np.zeros(n, dtype=np.float64)
    for j in range(d):
        x = A[:, j]
        y = B[:, j]
        dot += x * y
        na += x * x
        nb += y * y
    na = np.sqrt(na)
    nb = np.sqrt(nb)
    # Spark's `na > 0` is TRUE for NaN (NaN sorts above all doubles)
    ok = ((na > 0) | np.isnan(na)) & ((nb > 0) | np.isnan(nb))
    out = np.zeros(n, dtype=np.float64)
    if ok.any():
        with np.errstate(divide="ignore", invalid="ignore"):
            out[ok] = dot[ok] / (na[ok] * nb[ok])
    return out


def _fold_cosine_row(x, y):
    """Scalar fallback replicating the full native null/width law."""
    if x is None or y is None:
        return 0.0
    try:
        if any(v is None for v in x) or any(v is None for v in y):
            return 0.0  # null element nulls a norm -> cond never true -> 0.0
        xv = np.asarray(x, dtype=np.float64)
        yv = np.asarray(y, dtype=np.float64)
    except (TypeError, ValueError):
        return 0.0
    na = 0.0
    for v in xv:
        na += float(v) * float(v)
    nb = 0.0
    for v in yv:
        nb += float(v) * float(v)
    na = np.sqrt(na)
    nb = np.sqrt(nb)
    ok = (na > 0 or np.isnan(na)) and (nb > 0 or np.isnan(nb))
    if len(xv) != len(yv):
        # zip_with pads with nulls -> dot is NULL; when(cond, NULL) is NULL
        return None if ok else 0.0
    if not ok:
        return 0.0
    dot = 0.0
    for a, b in zip(xv, yv):
        dot += float(a) * float(b)
    return dot / (na * nb)


_COS_STRUCT = T.StructType(
    [T.StructField("v", T.DoubleType()), T.StructField("isnan", T.BooleanType())]
)


@F.pandas_udf(_COS_STRUCT)
def _cosine_fold_struct(a: pd.Series, b: pd.Series) -> pd.DataFrame:
    """(value, isnan) pair: pandas->Arrow maps NaN floats to NULL, so a NaN
    cosine (NaN-poisoned input vectors) could not otherwise be told apart
    from the law's genuine NULL (width mismatch). The wrapper below
    re-materializes NaN natively from the flag, keeping the twin exact on
    every input class, not just clean vectors."""
    n = len(a)
    vals: list
    if n == 0:
        vals = []
    else:
        vals = None
        try:
            A = np.array(a.tolist(), dtype=np.float64)
            B = np.array(b.tolist(), dtype=np.float64)
            if A.ndim == 2 and B.ndim == 2 and A.shape == B.shape:
                vals = list(_fold_cosine_mat(A, B))
        except (TypeError, ValueError):
            pass
        if vals is None:
            vals = [_fold_cosine_row(x, y) for x, y in zip(a, b)]
    isnan = [v is not None and np.isnan(v) for v in vals]
    return pd.DataFrame({"v": pd.Series(vals, dtype="float64"), "isnan": isnan})


def cosine_fold(a, b):
    """Bit-exact Arrow twin of ``functions.similarity.cosine_similarity``
    (a Column expression; evaluates the fold kernel once per pair)."""
    s = _cosine_fold_struct(a, b)
    # the two references are the SAME UDF expression: ExtractPythonUDFs
    # dedups equal Python UDFs in a projection, so the kernel runs once
    return F.when(s["isnan"], F.lit(float("nan"))).otherwise(s["v"])
