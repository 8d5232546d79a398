"""REAL SuperNNova LSTM — value-level parity for the reference's flagship
`snn_snia_vs_nonia` classifier, driven by the ACTUAL trained weights.

Reference semantics (ztf/snn/processor.py:84-210): selection cuts ->
SNANA FLUXCAL formatting -> SuperNNova's ``classify_lcs`` loads
``model.pt`` (2-layer bidirectional LSTM, hidden 32, input 8,
rnn_output_option=mean) and returns P(Ia) = softmax class 0.

The engine carries the REAL weights through the checkpoint seam
(``tools/extract_snn_weights.py`` transcribes model.pt bit-exactly with
stdlib pickle + numpy — no torch) and re-executes the forward pass two
ways:

* :func:`snn_forward_batch` — a vectorized numpy kernel (Arrow-batched
  behind ``mapInPandas`` via :func:`snn_ia_alert_scores`); float32 mode
  reproduces torch's production arithmetic.
* :func:`snn_lstm_sql` — an exact DuckDB twin: the K-step bidirectional
  recurrence unrolled as chained CTEs over DOUBLE[] list columns, the
  weights embedded as list literals (f32 values printed as their exact
  f64 representations). Gates use ``list_dot_product`` +
  ``list_transform`` lambdas; tanh is written ``1 - 2/(exp(2z)+1)``
  (DuckDB 1.0 has no tanh). Pad steps carry (h, c) through unchanged —
  exactly ``pack_padded_sequence`` semantics for a batch of one.

Preprocessing parity (:func:`snn_format_matrix`) was established
EMPIRICALLY against the reference's shipped production scores (the
124-alert ``data/alerts/datatest`` sample stores the broker's
``snn_snia_vs_nonia`` column): observations sort by MJD ascending;
same-night observations (0.33-day anchor window) collapse per filter to
the row with the SMALLEST FLUXCALERR; missing-filter slots fill 0.0
BEFORE the log-standardization; the one-hot is the night's filter
combination over [g, gr, r]; delta_time is the night-anchor gap,
log-standardized with the model's data_norm.json constants (clipped at
the training min). 40/124 production scores reproduce BIT-EXACTLY
(<1e-4, most <1e-7) including multi-night, dual-filter, gr-night and
dedup curves — every structural case. The remaining rows depend on the
production batch composition: SuperNNova's night-anchor loop ran over
the whole concatenated batch frame, so a curve's first group could
inherit the PREVIOUS curve's anchor, scrambling its step order after
the (SNID, grouped_MJD) pivot sort — per-curve step permutations of our
matrix reproduce those scores bit-exactly (see
tests/test_snn_lstm_real.py), which pins the cause but is unrecoverable
without the original Spark partition layout.

100 TB design: weights are a ~145 KB driver-side artifact embedded in
the serialized kernel closure (one copy per executor, ExecutorRegistry
memoized); scoring is embarrassingly parallel per alert — no shuffle,
no collect; the Arrow kernel amortizes per-batch.
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np

from fink_science_spark.operators.enrich import ExecutorRegistry

_DEFAULT_JSON = os.path.join(
    os.path.dirname(__file__), "..", "data", "snn_snia_vs_nonia_lstm.json"
)

HIDDEN = 32
INPUT_DIM = 8
FEATURES = [
    "FLUXCAL_g",
    "FLUXCAL_r",
    "FLUXCALERR_g",
    "FLUXCALERR_r",
    "delta_time",
    "g",
    "gr",
    "r",
]
NORMED = FEATURES[:5]
# activation clamp: tanh/sigmoid saturate exactly (f64) beyond |z|~19,
# so clipping at 30 is value-identical while keeping exp() finite.
# Applied IDENTICALLY in the SQL twin.
Z_CLAMP = 30.0


def checkpoint_path(model: str = "snn_snia_vs_nonia") -> str:
    """Per-model artifact resolution: both of the reference's ZTF
    SuperNNova classifiers (snn_snia_vs_nonia, snn_sn_vs_all — identical
    2x32 bi-LSTM architecture, different trained weights + data_norm)
    ship as committed checkpoints; env SPARK_GRAFT_SNN_LSTM overrides
    the default model's path."""
    if model == "snn_snia_vs_nonia":
        env = os.environ.get("SPARK_GRAFT_SNN_LSTM")
        if env:
            return env
        return os.path.normpath(_DEFAULT_JSON)
    return os.path.normpath(
        os.path.join(os.path.dirname(__file__), "..", "data", f"{model}_lstm.json")
    )


def load_snn_lstm(path: str | None = None) -> dict:
    """Load the checkpoint: name -> float32 ndarray, plus data_norm and
    arch metadata. Driver- or executor-side (ExecutorRegistry memoizes)."""
    p = path or checkpoint_path()

    def _load():
        with open(p) as f:
            art = json.load(f)
        tensors = {
            name: np.frombuffer(
                base64.b64decode(t["b64"]), dtype=np.dtype(t["dtype"])
            ).reshape(t["shape"])
            for name, t in art["tensors"].items()
        }
        return {
            "tensors": tensors,
            "norm": art["data_norm"],
            "arch": art["arch"],
        }

    return ExecutorRegistry.get(f"snn_lstm_v1:{p}", _load)


def _sigmoid(z):
    return 1.0 / (1.0 + np.exp(-z))


def _tanh_via_exp(z):
    """tanh as the SQL twin writes it: 1 - 2/(exp(2z)+1)."""
    return 1.0 - 2.0 / (np.exp(2.0 * z) + 1.0)


def snn_forward_batch(
    seqs: list[np.ndarray],
    weights: dict[str, np.ndarray],
    dtype=np.float32,
    sql_exact: bool = False,
) -> np.ndarray:
    """P(class 0) for a batch of variable-length (n_i, 8) sequences.

    dtype=float32 reproduces torch's production arithmetic; dtype=
    float64 with sql_exact=True mirrors the DuckDB twin's operation
    order (pre-summed biases, exp-form tanh, Z_CLAMP) so both engines
    agree past round(p, 6).
    """
    B = len(seqs)
    if B == 0:
        return np.zeros(0)
    lengths = np.array([len(s) for s in seqs])
    L = int(lengths.max())
    X = np.zeros((B, L, INPUT_DIM), dtype=dtype)
    for i, s in enumerate(seqs):
        X[i, : len(s)] = np.asarray(s, dtype=dtype)
    tanh = _tanh_via_exp if sql_exact else np.tanh

    def run_dir(seq, layer, reverse):
        sfx = f"l{layer}" + ("_reverse" if reverse else "")
        wih = weights[f"rnn_layer.weight_ih_{sfx}"].astype(dtype)
        whh = weights[f"rnn_layer.weight_hh_{sfx}"].astype(dtype)
        bih = weights[f"rnn_layer.bias_ih_{sfx}"].astype(dtype)
        bhh = weights[f"rnn_layer.bias_hh_{sfx}"].astype(dtype)
        if sql_exact:
            b = bih.astype(np.float64) + bhh.astype(np.float64)
            b = b.astype(dtype)
        h = np.zeros((B, HIDDEN), dtype=dtype)
        c = np.zeros((B, HIDDEN), dtype=dtype)
        out = np.zeros((B, L, HIDDEN), dtype=dtype)
        ts = range(L - 1, -1, -1) if reverse else range(L)
        for t in ts:
            if sql_exact:
                z = seq[:, t] @ wih.T + h @ whh.T + b
                z = np.clip(z, -Z_CLAMP, Z_CLAMP)
            else:
                z = seq[:, t] @ wih.T + bih + h @ whh.T + bhh
            i_g = _sigmoid(z[:, :HIDDEN])
            f_g = _sigmoid(z[:, HIDDEN : 2 * HIDDEN])
            g_g = tanh(z[:, 2 * HIDDEN : 3 * HIDDEN])
            o_g = _sigmoid(z[:, 3 * HIDDEN :])
            c_new = f_g * c + i_g * g_g
            h_new = o_g * tanh(c_new)
            real = (t < lengths)[:, None]
            c = np.where(real, c_new, c)
            h = np.where(real, h_new, h)
            out[:, t] = h
        return out

    seq = X
    for layer in (0, 1):
        fwd = run_dir(seq, layer, False)
        bwd = run_dir(seq, layer, True)
        seq = np.concatenate([fwd, bwd], axis=2)
    mask = (np.arange(L)[None, :] < lengths[:, None])[:, :, None]
    pooled = (seq * mask).sum(axis=1) / lengths[:, None].astype(dtype)
    W = weights["output_layer.weight"].astype(dtype)
    b = weights["output_layer.bias"].astype(dtype)
    logits = pooled @ W.T + b
    return np.asarray(_sigmoid(logits[:, 0] - logits[:, 1]), dtype=np.float64)


def norm_feature(x: np.ndarray, stats: dict) -> np.ndarray:
    """SuperNNova log-standardization with train-min clip (float64)."""
    x = np.clip(np.asarray(x, dtype=np.float64), stats["min"], np.inf)
    return (np.log(x - stats["min"] + 1e-5) - stats["mean"]) / stats["std"]


def mag2fluxcal_snana_np(mag, sig):
    flux = 10.0 ** (-0.4 * np.asarray(mag, dtype=np.float64)) * 1e11
    err = 9.21034e10 * np.exp(-0.921034 * np.asarray(mag, dtype=np.float64))
    return flux, err * np.asarray(sig, dtype=np.float64)


def snn_format_matrix(jd, fid, magpsf, sigmapsf, norm) -> np.ndarray:
    """One alert history -> SuperNNova (n_steps, 8) feature matrix, per
    the empirically pinned per-curve semantics (module docstring).
    Upper limits (NaN mag/err) and non-g/r filters drop; returns an
    empty (0, 8) array when nothing survives."""
    rows = []
    for j, f, m, s in zip(jd, fid, magpsf, sigmapsf):
        if m is None or s is None or j is None or f is None:
            continue
        m = float(m)
        s = float(s)
        if np.isnan(m) or np.isnan(s):
            continue
        if int(f) not in (1, 2):
            continue
        fl, er = mag2fluxcal_snana_np(m, s)
        rows.append((float(j), "g" if int(f) == 1 else "r", float(fl), float(er)))
    if not rows:
        return np.zeros((0, INPUT_DIM))
    rows.sort(key=lambda r: r[0])
    # 0.33-day anchor night grouping
    groups: list[dict] = []
    anchor = None
    for mjd, flt, fl, er in rows:
        if anchor is None or mjd - anchor > 0.33:
            anchor = mjd
            groups.append({"mjd": anchor, "obs": {}})
        g = groups[-1]
        # per (night, filter): smallest FLUXCALERR survives
        if flt not in g["obs"] or er < g["obs"][flt][1]:
            g["obs"][flt] = (fl, er)
    X = np.zeros((len(groups), INPUT_DIM))
    prev_mjd = None
    for t, g in enumerate(groups):
        fg, eg = g["obs"].get("g", (0.0, 0.0))
        fr, er_ = g["obs"].get("r", (0.0, 0.0))
        dt = 0.0 if prev_mjd is None else g["mjd"] - prev_mjd
        prev_mjd = g["mjd"]
        combo = "".join(sorted(g["obs"]))
        X[t, 0] = norm_feature(fg, norm["FLUXCAL_g"])
        X[t, 1] = norm_feature(fr, norm["FLUXCAL_r"])
        X[t, 2] = norm_feature(eg, norm["FLUXCALERR_g"])
        X[t, 3] = norm_feature(er_, norm["FLUXCALERR_r"])
        X[t, 4] = norm_feature(dt, norm["delta_time"])
        X[t, 5] = 1.0 if combo == "g" else 0.0
        X[t, 6] = 1.0 if combo == "gr" else 0.0
        X[t, 7] = 1.0 if combo == "r" else 0.0
    return X


def snn_ia_alert_scores(
    df,
    jd_col="cjd",
    fid_col="cfid",
    mag_col="cmagpsf",
    sig_col="csigmapsf",
    out_col="snn_ia",
    model_path: str | None = None,
):
    """Score alert-shaped rows (array columns of history) with the REAL
    SuperNNova weights. One Arrow-batched mapInPandas stage; rows whose
    history has no valid g/r detection score 0.0 (reference's cut
    sentinel). Column-pruning-friendly: passes every input column
    through unchanged and appends ``out_col``."""
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    if model_path is None:
        model_path = checkpoint_path()
    schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType(), True)]
    )

    def kernel(batches):
        art = load_snn_lstm(model_path)
        w, norm = art["tensors"], art["norm"]
        for pdf in batches:
            seqs, keep = [], []
            for i in range(len(pdf)):
                X = snn_format_matrix(
                    pdf[jd_col].iloc[i],
                    pdf[fid_col].iloc[i],
                    pdf[mag_col].iloc[i],
                    pdf[sig_col].iloc[i],
                    norm,
                )
                if len(X):
                    seqs.append(X)
                    keep.append(i)
            scores = np.zeros(len(pdf))
            if seqs:
                probs = snn_forward_batch(seqs, w, dtype=np.float32)
                for i, p in zip(keep, probs):
                    scores[i] = p
            out = pdf.copy()
            out[out_col] = scores
            yield out

    return df.mapInPandas(kernel, schema=schema)


# --------------------------------------------------------------------------
# DuckDB SQL twin: fixed-K unrolled bidirectional LSTM over list columns.
# --------------------------------------------------------------------------


def _f(v) -> str:
    """Exact f64 literal of a float32 weight (f32 -> f64 is exact)."""
    return repr(float(v))


def _list_lit(vec) -> str:
    return "[" + ",".join(_f(v) for v in vec) + "]"


def _list2_lit(mat) -> str:
    return "[" + ",".join(_list_lit(row) for row in mat) + "]"


def snn_weight_cte(weights: dict[str, np.ndarray]) -> str:
    """The `w` CTE carrying every weight as a DOUBLE[] / DOUBLE[][]
    literal (biases pre-summed ih+hh in float64, matching the kernel's
    sql_exact mode)."""
    cols = []
    for layer in (0, 1):
        for rev in ("", "_reverse"):
            tag = f"l{layer}" + ("r" if rev else "f")
            wih = weights[f"rnn_layer.weight_ih_l{layer}{rev}"]
            whh = weights[f"rnn_layer.weight_hh_l{layer}{rev}"]
            b = weights[f"rnn_layer.bias_ih_l{layer}{rev}"].astype(
                np.float64
            ) + weights[f"rnn_layer.bias_hh_l{layer}{rev}"].astype(np.float64)
            cols.append(f"{_list2_lit(wih)}::DOUBLE[][] AS wih_{tag}")
            cols.append(f"{_list2_lit(whh)}::DOUBLE[][] AS whh_{tag}")
            cols.append(
                "["
                + ",".join(repr(float(x)) for x in b)
                + f"]::DOUBLE[] AS b_{tag}"
            )
    wo = weights["output_layer.weight"]
    bo = weights["output_layer.bias"]
    cols.append(f"{_list2_lit(wo)}::DOUBLE[][] AS w_out")
    cols.append(f"{_list_lit(bo)}::DOUBLE[] AS b_out")
    return "w AS (SELECT " + ", ".join(cols) + ")"


def _sig_sql(z: str) -> str:
    return f"(1.0/(1.0+exp(-({z}))))"


def _tanh_sql(z: str) -> str:
    return f"(1.0 - 2.0/(exp(2.0*({z}))+1.0))"


def _clamp_sql(z: str) -> str:
    return f"least(greatest({z}, {-Z_CLAMP!r}), {Z_CLAMP!r})"


def snn_lstm_sql(K: int, source: str, n_col: str = "n") -> tuple[str, str, str]:
    """Unrolled K-step bi-LSTM SQL. ``source`` must expose ``xs``
    (DOUBLE[][]: K rows of 8 features, pad rows arbitrary) and
    ``n_col`` (real step count, 1..K) plus the `w` CTE columns
    (cross-joined). Returns (ctes_sql, last_cte, prob_expr).

    Per step/direction/layer two CTEs: `z` (128 clamped gate
    pre-activations) then `hc` (32-wide h and c with pad carry)."""
    ctes = []
    cur = source

    def step_ctes(layer, rev, t, in_expr, prefix):
        nonlocal cur, ctes
        tag = f"l{layer}" + ("r" if rev else "f")
        zc = f"z_{prefix}_{t}"
        hn, cn = f"h_{prefix}_{t}", f"c_{prefix}_{t}"
        if (not rev and t == 1) or (rev and t == K):
            hp = "([" + ",".join(["0.0"] * HIDDEN) + "]::DOUBLE[])"
            cp = hp
        else:
            pt = t - 1 if not rev else t + 1
            hp, cp = f"h_{prefix}_{pt}", f"c_{prefix}_{pt}"
        name_z = f"s_{prefix}_{t}z"
        ctes.append(
            f"{name_z} AS (SELECT *, list_transform(range(1,129), k -> "
            f"{_clamp_sql(f'list_dot_product(wih_{tag}[k], {in_expr}) + list_dot_product(whh_{tag}[k], {hp}) + b_{tag}[k]')}"
            f") AS {zc} FROM {cur})"
        )
        cur_z = name_z
        real = f"{t} <= {n_col}"
        c_expr = (
            f"list_transform(range(1,33), j -> CASE WHEN {real} THEN "
            f"{_sig_sql(f'{zc}[j+32]')} * {cp}[j] + {_sig_sql(f'{zc}[j]')} * {_tanh_sql(f'{zc}[j+64]')}"
            f" ELSE {cp}[j] END)"
        )
        name_hc = f"s_{prefix}_{t}"
        ctes.append(
            f"{name_hc} AS (SELECT *, {c_expr} AS {cn} FROM {cur_z})"
        )
        h_expr = (
            f"list_transform(range(1,33), j -> CASE WHEN {real} THEN "
            f"{_sig_sql(f'{zc}[j+96]')} * {_tanh_sql(f'{cn}[j]')} ELSE {hp}[j] END)"
        )
        name_h = f"s_{prefix}_{t}h"
        ctes.append(f"{name_h} AS (SELECT *, {h_expr} AS {hn} FROM {name_hc})")
        cur = name_h
        return hn

    # layer 0: inputs are xs[t]
    h0f = [step_ctes(0, False, t, f"xs[{t}]", "0f") for t in range(1, K + 1)]
    h0b = [
        step_ctes(0, True, t, f"xs[{t}]", "0b")
        for t in range(K, 0, -1)
    ]
    # layer 1: inputs are concat(h0f_t, h0b_t)
    def cat0(t):
        return f"list_concat(h_0f_{t}, h_0b_{t})"

    h1f = [step_ctes(1, False, t, cat0(t), "1f") for t in range(1, K + 1)]
    h1b = [step_ctes(1, True, t, cat0(t), "1b") for t in range(K, 0, -1)]
    # mean pool over real steps of concat(h_1f_t, h_1b_t), then head
    pooled_terms_f = []
    pooled_terms_b = []
    for t in range(1, K + 1):
        pooled_terms_f.append(
            f"CASE WHEN {t} <= {n_col} THEN h_1f_{t}[j] ELSE 0.0 END"
        )
        pooled_terms_b.append(
            f"CASE WHEN {t} <= {n_col} THEN h_1b_{t}[j] ELSE 0.0 END"
        )
    pooled = (
        "list_transform(range(1,33), j -> ("
        + " + ".join(pooled_terms_f)
        + f") / {n_col})"
    )
    pooled_b = (
        "list_transform(range(1,33), j -> ("
        + " + ".join(pooled_terms_b)
        + f") / {n_col})"
    )
    ctes.append(
        f"pooled AS (SELECT *, list_concat({pooled}, {pooled_b}) AS pool64 "
        f"FROM {cur})"
    )
    prob = _sig_sql(
        "(list_dot_product(w_out[1], pool64) + b_out[1])"
        " - (list_dot_product(w_out[2], pool64) + b_out[2])"
    )
    return ",\n".join(ctes), "pooled", prob
