"""Pure-numpy frozen-weight model scoring — the reference's ML-UDF surface
without ML libraries.

The reference's largest module family is "load a trained model on each
executor, featurize the alert history, predict a probability, fill a
default for rows failing the selection cuts" (sklearn random forest:
ztf/random_forest_snia/processor.py:77-216; torch SuperNNova:
ztf/snn/processor.py:84-210; Keras CATS: rubin/cats/processor.py:41-169;
ONNX anomaly: ztf/anomaly_detection/processor.py:136-242; XGBoost orphans:
rubin/orphans/processor.py:29-102). None of those runtimes exist in this
container, but the *engine shape* — executor-singleton model state, Arrow
batch featurize→forward→scatter, mask/default policy — does not depend on
the runtime. This module freezes a small MLP's weights as literals and
runs the forward pass in numpy, exercising the exact pipeline a real
model drops into (`ExecutorRegistry` slot, masked pandas kernel,
default-fill for cut rows).

Because the weights are literals, the forward pass is *also* expressible
in ANSI SQL (relu = greatest, sigmoid = 1/(1+exp(-z))), so unlike a real
RF/torch model the scoring query gets an exact DuckDB oracle:
:func:`mlp_score_sql` emits the same network over the same feature
expressions, term-for-term in the same left-to-right evaluation order as
the numpy kernel (which accumulates feature-by-feature, not via BLAS
dot, precisely so both engines see the same float64 operation sequence).

At 100 TB the scoring stage is embarrassingly parallel: no shuffle, model
weights are per-process constants (a real checkpoint would be a broadcast
or an executor-local file), and Python cost scales with the rows passing
the native pre-cuts only (`apply_masked_pandas_kernel`).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from fink_science_spark.operators.enrich import ExecutorRegistry

# Frozen "trained" network: 4 features -> 3 relu units -> 1 sigmoid.
# Literal decimal weights so repr() round-trips bit-exactly into SQL.
MLP_W1 = [
    [0.8, -1.2, 0.5, 0.3],
    [-0.4, 0.9, -0.7, 0.2],
    [0.6, 0.1, 0.4, -0.5],
]
MLP_B1 = [0.1, -0.2, 0.05]
MLP_W2 = [1.5, -2.0, 0.8]
MLP_B2 = -0.25


# --------------------------------------------------------------------------
# Checkpoint seam: the weights above are the builtin artifact; a real
# training run drops a JSON file in their place. The path is resolved on
# the DRIVER (env SPARK_GRAFT_MODEL_CHECKPOINT or an explicit factory
# argument) and captured in the UDF closure, so it ships to executors in
# the serialized task — on a cluster the path must be shared storage.
# Each executor process loads the file once via ExecutorRegistry (keyed by
# path, so builtin and checkpointed kernels coexist), exactly the
# reference's load-once module-global pattern (rubin/cats/processor.py:
# 34-38, ztf/snn/processor.py:84-210) without the import-time global.
# --------------------------------------------------------------------------


def checkpoint_path() -> str | None:
    """Driver-side resolution of the model artifact path (None = builtin
    frozen literals)."""
    import os

    return os.environ.get("SPARK_GRAFT_MODEL_CHECKPOINT") or None


def save_checkpoint(path: str) -> None:
    """Serialize the current weights as the on-disk artifact format: one
    JSON object holding the MLP matrices and the forest node tree (tuples
    become JSON arrays; the loader restores them)."""
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "mlp": {"W1": MLP_W1, "b1": MLP_B1, "W2": MLP_W2, "b2": MLP_B2},
                "forest": FOREST,
            },
            f,
        )


def _read_checkpoint(path: str) -> dict:
    import json

    with open(path) as f:
        return json.load(f)


def _load_model(path: str | None = None):
    """Executor-side model materialization (the slot a real
    joblib/torch/ONNX load occupies — rubin/cats/processor.py:34-38).
    With ``path``, weights come from the JSON artifact instead of the
    module literals — nothing downstream changes."""
    import numpy as np

    if path is not None:
        m = _read_checkpoint(path)["mlp"]
        w1, b1, w2, b2 = m["W1"], m["b1"], m["W2"], m["b2"]
    else:
        w1, b1, w2, b2 = MLP_W1, MLP_B1, MLP_W2, MLP_B2
    return {
        "W1": np.asarray(w1, dtype=np.float64),
        "b1": np.asarray(b1, dtype=np.float64),
        "W2": np.asarray(w2, dtype=np.float64),
        "b2": float(b2),
    }


def mlp_forward(xs, model_path: str | None = None):
    """Vectorized forward pass over a list of 1-D feature arrays (one per
    feature, each of length n_rows). Accumulates the linear terms
    feature-by-feature, left to right, matching the SQL oracle's operation
    order exactly (BLAS dot may reorder the sum and flip the last ulp)."""
    import numpy as np

    model = ExecutorRegistry.get(
        f"frozen_mlp_v1:{model_path or 'builtin'}",
        lambda: _load_model(model_path),
    )
    n = len(xs[0])
    z_out = np.full(n, model["b2"], dtype=np.float64)
    for j in range(len(model["b1"])):
        acc = xs[0] * float(model["W1"][j][0])
        for k in range(1, len(xs)):
            acc = acc + xs[k] * float(model["W1"][j][k])
        h = acc + float(model["b1"][j])
        np.maximum(h, 0.0, out=h)
        z_out = z_out + h * float(model["W2"][j])
    return 1.0 / (1.0 + np.exp(-z_out))


def make_mlp_score_udf(model_path: str | None = None):
    """Arrow-batched scoring kernel: the `clf.predict_proba` slot of
    ztf/random_forest_snia/processor.py:200-216, numpy-frozen. Factory
    (not module-level) because pandas_udf needs an active session.
    ``model_path`` (default: SPARK_GRAFT_MODEL_CHECKPOINT) swaps in an
    on-disk artifact; the closure carries it to executors."""
    if model_path is None:
        model_path = checkpoint_path()

    @F.pandas_udf("double")
    def mlp_score_udf(
        x1: pd.Series, x2: pd.Series, x3: pd.Series, x4: pd.Series
    ) -> pd.Series:
        import numpy as np

        xs = [s.to_numpy(dtype=np.float64) for s in (x1, x2, x3, x4)]
        return pd.Series(mlp_forward(xs, model_path))

    return mlp_score_udf


def mlp_score_sql(feature_exprs: list[str]) -> str:
    """The identical network as a scalar SQL expression over the given
    feature expressions — the differential oracle for the numpy path."""
    hidden = []
    for j in range(len(MLP_B1)):
        terms = " + ".join(
            f"({feature_exprs[k]}) * ({MLP_W1[j][k]!r})"
            for k in range(len(feature_exprs))
        )
        hidden.append(f"greatest(({terms}) + ({MLP_B1[j]!r}), 0.0)")
    z = " + ".join(
        f"{h} * ({MLP_W2[j]!r})" for j, h in enumerate(hidden)
    )
    return f"1.0 / (1.0 + exp(-(({z}) + ({MLP_B2!r}))))"


# --------------------------------------------------------------------------
# Frozen decision forest — the tree-ensemble kernel family (sklearn RF /
# XGBoost shape) as distinct from the matmul family above. predict_proba
# of an RF is the MEAN of per-tree leaf probabilities
# (ztf/random_forest_snia/processor.py:200-216 uses clf.predict_proba[:,1];
# rubin/orphans/processor.py:29-102 is the XGBoost twin).
#
# IMPORTANT feature contract: tree output is DISCONTINUOUS at thresholds,
# so forest features must be exact IEEE arithmetic only (+,-,*,/ on
# stored doubles) — never libm calls (log/exp/pow), whose last-ulp
# engine differences could flip a comparison and change the leaf. The
# MLP above tolerates libm features because its output is continuous and
# rounded; the forest does not.
# --------------------------------------------------------------------------

# Each node: (feature_idx, threshold, lo_subtree, hi_subtree); leaves are
# bare probabilities. Literal decimal thresholds repr()-round-trip into
# SQL bit-exactly.
FOREST = [
    (0, 24.0, (2, 0.55, 0.05, 0.35), (1, 2.4, 0.55, 0.9)),
    (1, 0.9, (3, 0.45, 0.1, 0.3), (0, 38.0, 0.6, 0.85)),
    (2, 0.25, 0.15, (1, 4.2, 0.5, 0.8)),
    (3, 0.35, (0, 12.0, 0.2, 0.4), (2, 0.75, 0.45, 0.7)),
]


def _untuple_node(nd):
    """JSON arrays back to the (feat, thresh, lo, hi) node tuples."""
    if isinstance(nd, (list, tuple)):
        f, t, lo, hi = nd
        return (int(f), float(t), _untuple_node(lo), _untuple_node(hi))
    return float(nd)


def _load_forest(path: str | None = None):
    """Executor-side materialization slot (a real joblib.load /
    xgb.Booster.load_model goes here). With ``path``, the node tree comes
    from the JSON artifact."""
    if path is not None:
        return [_untuple_node(t) for t in _read_checkpoint(path)["forest"]]
    return FOREST


def forest_forward(xs, model_path: str | None = None):
    """Vectorized forest evaluation: np.where per node (both subtrees
    evaluated, branch selected per row — the standard vectorized-tree
    trick), tree votes averaged in declaration order."""
    import numpy as np

    forest = ExecutorRegistry.get(
        f"frozen_forest_v1:{model_path or 'builtin'}",
        lambda: _load_forest(model_path),
    )

    def node(nd):
        if not isinstance(nd, tuple):
            return float(nd)
        f, t, lo, hi = nd
        return np.where(xs[f] <= t, node(lo), node(hi))

    acc = node(forest[0])
    for tree in forest[1:]:
        acc = acc + node(tree)
    return acc / float(len(forest))


def make_forest_score_udf(model_path: str | None = None):
    """Arrow-batched forest scoring kernel (factory: pandas_udf needs an
    active session). ``model_path`` (default:
    SPARK_GRAFT_MODEL_CHECKPOINT) swaps in an on-disk artifact."""
    if model_path is None:
        model_path = checkpoint_path()

    @F.pandas_udf("double")
    def forest_score_udf(
        x1: pd.Series, x2: pd.Series, x3: pd.Series, x4: pd.Series
    ) -> pd.Series:
        import numpy as np

        xs = [s.to_numpy(dtype=np.float64) for s in (x1, x2, x3, x4)]
        return pd.Series(forest_forward(xs, model_path))

    return forest_score_udf


def forest_score_sql(feature_exprs: list[str]) -> str:
    """The identical forest as nested CASE WHEN — the differential oracle
    for the numpy path (same thresholds, same <= comparisons, same
    left-to-right vote sum)."""

    def node(nd) -> str:
        if not isinstance(nd, tuple):
            return repr(float(nd))
        f, t, lo, hi = nd
        return (
            f"CASE WHEN ({feature_exprs[f]}) <= ({t!r}) "
            f"THEN {node(lo)} ELSE {node(hi)} END"
        )

    votes = " + ".join(f"({node(tree)})" for tree in FOREST)
    return f"(({votes}) / {float(len(FOREST))!r})"


# --------------------------------------------------------------------------
# Hashed-n-gram linear text classifier — the fastText-shaped quality
# classifier a curation pipeline runs corpus-wide (CCNet/GPT-3-style
# "looks like reference text?" filtering). Bag of unigrams+bigrams →
# feature hashing into B buckets → frozen linear weights → sigmoid.
#
# Weights are dyadic rationals (k/1024): exact in binary, so the per-doc
# weight SUM is exact and order-independent — the engines can fold the
# gram list in any order and still bit-match. Only the final exp() is
# libm, and it lands after rounding-tolerant sigmoid output.
#
# Executed as native array HOFs (transform + aggregate) — per-row map,
# no shuffle, no Python; at 100 TB this runs at scan speed.
# --------------------------------------------------------------------------

FT_BUCKETS = 64
FT_SEED = "ftq"
FT_GAIN = 20.0  # spreads the mean bucket weight into a useful logit range
FT_BIAS = -8.0 / 1024.0

# frozen "trained" weights: ((k*37 + 11) % 128 − 64) / 1024, k = 0..63
FT_WEIGHTS = [((k * 37 + 11) % 128 - 64) / 1024.0 for k in range(FT_BUCKETS)]


def ft_score_col(grams):
    """Sigmoid linear score of a gram-array Column (native HOFs only)."""
    from fink_science_spark.functions.hashing import hash64

    warr = F.array(*[F.lit(w) for w in FT_WEIGHTS])
    wsum = F.aggregate(
        F.transform(
            grams,
            lambda g: F.element_at(
                warr, (hash64(g, seed=FT_SEED) % FT_BUCKETS + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n = F.size(grams)
    logit = F.lit(FT_BIAS) + F.lit(FT_GAIN) * F.when(n > 0, wsum / n).otherwise(
        F.lit(0.0)
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))


def ft_score_sql(grams_expr: str) -> str:
    """The duckdb twin of :func:`ft_score_col` over a list expression."""
    from fink_science_spark.functions.hashing import hash64_sql

    wlist = "[" + ", ".join(repr(w) for w in FT_WEIGHTS) + "]"
    bucket = f"({hash64_sql('g', seed=FT_SEED)}) % {FT_BUCKETS} + 1"
    wsum = f"list_sum(list_transform({grams_expr}, g -> ({wlist})[{bucket}]))"
    n = f"len({grams_expr})"
    logit = (
        f"({FT_BIAS!r} + {FT_GAIN!r} * "
        f"(CASE WHEN {n} > 0 THEN ({wsum}) / {n} ELSE 0.0 END))"
    )
    return f"1.0 / (1.0 + exp(-{logit}))"


# --------------------------------------------------------------------------
# Frozen unrolled RNN — the recurrent kernel family (SuperNNova torch RNN,
# ztf/snn/processor.py:84-210; rubin/snn/processor.py:35-157). The
# reference feeds a variable-length SNANA-formatted light curve through a
# trained RNN; the engine shape is a FIXED-K unrolled recurrence over the
# padded sequence (pad steps carry the hidden state through unchanged —
# the packed-sequence semantics), which makes the forward pass pure
# column algebra: no UDF, whole-stage codegen, and an exact SQL twin.
#
# h_t = atan(Wx·x_t + Wd·d_t + U·h_{t-1} + b)   (hidden size 2)
# p   = sigmoid(V·h_K + c)
#
# The activation is atan — saturating like tanh, present in BOTH engines
# (duckdb has no tanh), and crucially it references its argument ONCE:
# writing tanh via exp would duplicate the recurrence subtree.
#
# The forward pass is ONE ``F.aggregate`` fold over an array of per-step
# (x, d, is_pad) structs: the recurrence body is written ONCE in the
# lambda, so the expression is linear in K no matter what Catalyst does
# around it. The previous form (one NAMED projection per step) kept the
# PLAN linear but not the closure under optimization: a downstream
# filter/aggregate referencing the output gets pushed through the
# projection chain by substitution, and each substituted step references
# the prior hidden state twice — 2^K expansion of the predicate, which
# sent codegen into minutes-long string assembly the moment a caller
# filtered on the score. A fold has no projection chain to push through.
# HOF lambdas are interpreted (no codegen), which is the right trade for
# a K-step scalar recurrence. atan/sigmoid are continuous, so last-ulp
# libm differences between engines stay bounded through the recurrence
# (|atan'| <= 1, |U| < 1 keeps the map contractive) and vanish under
# round(p, 6).
# --------------------------------------------------------------------------

RNN_WX = [0.9, -0.6]     # input weight per hidden unit (flux feature)
RNN_WD = [0.3, 0.5]      # input weight per hidden unit (time-delta feature)
RNN_U = [
    [0.5, -0.25],        # recurrent weights, row = target unit
    [0.25, 0.5],
]
RNN_B = [0.1, -0.1]
RNN_V = [1.8, -1.4]      # readout
RNN_C = 0.2


def rnn_apply(df, steps, out_col: str):
    """Run the frozen recurrence over ``steps`` = list of (x, d, is_pad)
    Column triples in time order as ONE ``aggregate`` fold (see the
    design note above), returning the DataFrame with ``out_col`` =
    sigmoid readout.  Identical per-step operation order to
    :func:`rnn_sql_ctes`."""
    from pyspark.sql import functions as F

    arr = F.array(
        *[
            F.struct(
                x.alias("x"),
                d.alias("d"),
                is_pad.cast("boolean").alias("p"),
            )
            for (x, d, is_pad) in steps
        ]
    )

    def step(acc, s):
        prev = [acc["h0"], acc["h1"]]
        cols = []
        for j in range(2):
            z = (
                s["x"] * F.lit(RNN_WX[j])
                + s["d"] * F.lit(RNN_WD[j])
                + prev[0] * F.lit(RNN_U[j][0])
                + prev[1] * F.lit(RNN_U[j][1])
                + F.lit(RNN_B[j])
            )
            cols.append(
                F.when(s["p"], prev[j]).otherwise(F.atan(z)).alias(f"h{j}")
            )
        return F.struct(*cols)

    def readout(acc):
        z_out = (
            acc["h0"] * F.lit(RNN_V[0])
            + acc["h1"] * F.lit(RNN_V[1])
            + F.lit(RNN_C)
        )
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-z_out))

    init = F.struct(F.lit(0.0).alias("h0"), F.lit(0.0).alias("h1"))
    return df.withColumn(out_col, F.aggregate(arr, init, step, readout))


def rnn_sql_ctes(steps, source: str, prefix: str = "s"):
    """SQL twin: chained CTEs, one per step, identical literals and
    operation order. ``steps`` = (x_expr, d_expr, is_pad_expr) string
    triples over ``source``'s columns. Returns (cte_sql, last_cte_name,
    prob_expr)."""
    prev = ["0.0", "0.0"]
    ctes = []
    cur = source
    for t, (x, d, is_pad) in enumerate(steps):
        exprs = []
        for j in range(2):
            z = (
                f"({x}) * ({RNN_WX[j]!r}) + ({d}) * ({RNN_WD[j]!r})"
                f" + ({prev[0]}) * ({RNN_U[j][0]!r})"
                f" + ({prev[1]}) * ({RNN_U[j][1]!r}) + ({RNN_B[j]!r})"
            )
            exprs.append(
                f"CASE WHEN {is_pad} THEN {prev[j]} ELSE atan({z}) END"
                f" AS __h{t}_{j}"
            )
        name = f"{prefix}{t}"
        ctes.append(f"{name} AS (SELECT *, {', '.join(exprs)} FROM {cur})")
        prev = [f"__h{t}_0", f"__h{t}_1"]
        cur = name
    z_out = (
        f"({prev[0]}) * ({RNN_V[0]!r}) + ({prev[1]}) * ({RNN_V[1]!r})"
        f" + ({RNN_C!r})"
    )
    return ",\n".join(ctes), cur, f"(1.0 / (1.0 + exp(-({z_out}))))"
