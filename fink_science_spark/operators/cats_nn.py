"""REAL CATS sequence classifier — the reference's CBPF broad-class
model (rubin/cats/processor.py:36-169), executed as a numpy kernel from
weights transcribed out of the TensorFlow SavedModel with stdlib tooling
(tools/extract_tf_cats.py: TensorBundle SSTable + TrackableObjectGraph +
keras_metadata.pb — no tensorflow import).

Architecture (517,541 params, float32):
input (L, 4: [mjd-mjd0, minmax flux, minmax fluxerr, band 1..6]) ->
  conv branch: 3 x [Conv1D(k=2, 'same') -> BatchNorm(eps 1e-3) -> swish
   -> squeeze-excite (GlobalAvgPool -> Dense r relu -> Dense C sigmoid
   -> channel multiply)], C = 64/128/256 -> GlobalMaxPool -> 256
  recurrent branch: biLSTM(50, sequences) -> biLSTM(150, last) -> 300
  concat [lstm, conv] -> Dense(176) -> LeakyReLU(0.3) -> Dense(5 softmax)

Classes: SN-like / Fast / Long / Periodic / non-Periodic (AGN).

Keras semantics reproduced exactly: 'same' conv with k=2 pads ONE zero
frame on the right; no masking anywhere (pads of -999 flow through as
data — the model was trained that way); LSTM gate order i|f|c|o with
sigmoid recurrent activation; the backward direction of a
return_sequences layer re-reverses its outputs; dropout layers are
inference no-ops.

Input prep (reference's predict_nn): mjd rebased to first observation,
flux/err min-max normalized per curve (single-point curves -> [1.0]),
bands mapped u..y -> 1..6, padded POST to 395 with -999.0 (band pad 0),
truncated PRE (keras pad_sequences default keeps the LAST 395 steps).
Curves with <2 points take the reference's all-zero probability vector.
"""

from __future__ import annotations

import base64
import json
import os

import numpy as np

from fink_science_spark.operators.enrich import ExecutorRegistry

_DEFAULT = os.path.join(
    os.path.dirname(__file__), "..", "data", "cats_model.json.gz"
)

MAXLEN = 395
PAD = -999.0
FILTER_DICT = {"u": 1, "g": 2, "r": 3, "i": 4, "z": 5, "y": 6}
CLASSES = ["SN-like", "Fast", "Long", "Periodic", "non-Periodic (AGN)"]


def checkpoint_path() -> str:
    return os.environ.get("SPARK_GRAFT_CATS_CKPT") or os.path.normpath(
        _DEFAULT
    )


def load_cats(path: str | None = None) -> dict:
    p = path or checkpoint_path()

    def _load():
        import gzip

        with gzip.open(p, "rt") as f:
            art = json.load(f)
        art["tensors"] = {
            k: np.frombuffer(
                base64.b64decode(t["b64"]), dtype=np.dtype(t["dtype"])
            ).reshape(t["shape"])
            for k, t in art["tensors"].items()
        }
        return art

    return ExecutorRegistry.get(f"cats_v1:{p}", _load)


def _sig(z):
    """Overflow-stable logistic: clipping at ±80 is value-identical in
    float32 (the sigmoid saturates to exactly 0.0/1.0 beyond |z|≈17)
    while keeping exp() finite for the -999 pad frames."""
    return 1.0 / (1.0 + np.exp(-np.clip(z, -80.0, 80.0)))


def _conv_bn_se(x, w, i):
    """One Conv1D('same', k=2) + BN + swish + squeeze-excite block.
    x: (B, L, Cin) -> (B, L, Cout)."""
    k = w[f"conv{i}/kernel"]  # (2, Cin, Cout)
    b = w[f"conv{i}/bias"]
    # 'same' with k=2, stride 1: y[t] = x[t] @ k0 + x[t+1] @ k1 (+right pad)
    xp = np.concatenate([x, np.zeros_like(x[:, :1])], axis=1)
    y = x @ k[0] + xp[:, 1:] @ k[1] + b
    gamma, beta = w[f"bn{i}/gamma"], w[f"bn{i}/beta"]
    mean, var = w[f"bn{i}/moving_mean"], w[f"bn{i}/moving_variance"]
    y = gamma * (y - mean) / np.sqrt(var + np.float32(1e-3)) + beta
    y = y * _sig(y)  # swish
    se = y.mean(axis=1)  # GlobalAveragePooling1D (no mask)
    se = np.maximum(se @ w[f"se{i}_reduce/kernel"], 0.0)
    se = _sig(se @ w[f"se{i}_expand/kernel"])
    return y * se[:, None, :]


def _bilstm(x, w, name, return_sequences):
    """Both directions ride ONE recurrence as a 2B-stacked batch (the
    backward half consumes the time-reversed input — go_backwards
    semantics — and its outputs reverse back afterwards); the input
    projection x@kernel+bias is hoisted out of the step loop as one
    (2B, L, 4H) matmul, leaving only h@recurrent per step."""
    B, L, _ = x.shape
    kf, kb = w[f"{name}_fwd/kernel"], w[f"{name}_bwd/kernel"]
    rf, rb = (
        w[f"{name}_fwd/recurrent_kernel"],
        w[f"{name}_bwd/recurrent_kernel"],
    )
    bf, bb = w[f"{name}_fwd/bias"], w[f"{name}_bwd/bias"]
    H = rf.shape[0]
    zx = np.concatenate(
        [x @ kf + bf, x[:, ::-1] @ kb + bb], axis=0
    )  # (2B, L, 4H)
    h = np.zeros((2 * B, H), dtype=x.dtype)
    c = np.zeros((2 * B, H), dtype=x.dtype)
    out = np.zeros((2 * B, L, H), dtype=x.dtype)
    for t in range(L):
        z = zx[:, t].copy()
        z[:B] += h[:B] @ rf
        z[B:] += h[B:] @ rb
        i = _sig(z[:, :H])
        f = _sig(z[:, H : 2 * H])
        g = np.tanh(z[:, 2 * H : 3 * H])
        o = _sig(z[:, 3 * H :])
        c = f * c + i * g
        h = o * np.tanh(c)
        out[:, t] = h
    fwd, bwd = out[:B], out[B:, ::-1]
    if return_sequences:
        return np.concatenate([fwd, bwd], axis=2)
    # last forward output; backward's "last" is its state after t=0
    return np.concatenate([fwd[:, -1], bwd[:, 0]], axis=1)


def cats_forward_batch(X: np.ndarray, art: dict) -> np.ndarray:
    """(B, L, 4) float32 -> (B, 5) softmax probabilities."""
    w = art["tensors"]
    X = np.asarray(X, dtype=np.float32)
    y = X
    for i in (1, 2, 3):
        y = _conv_bn_se(y, w, i)
    conv_feat = y.max(axis=1)  # GlobalMaxPooling1D
    seq = _bilstm(X, w, "lstm1", return_sequences=True)
    lstm_feat = _bilstm(seq, w, "lstm2", return_sequences=False)
    feat = np.concatenate([lstm_feat, conv_feat], axis=1)  # [lstm, conv]
    z = feat @ w["head/kernel"] + w["head/bias"]
    alpha = np.float32(art["arch"]["leaky_relu_alpha"])
    z = np.where(z > 0, z, alpha * z)
    logits = z @ w["out/kernel"] + w["out/bias"]
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    return e / e.sum(axis=1, keepdims=True)


def cats_format_inputs(mjd, flux, err, band, maxlen: int = MAXLEN):
    """One curve -> (maxlen, 4) float32 per the reference's predict_nn
    prep. `band` entries may be LSST letters or 1-based ints."""
    mjd = np.asarray([float(v) for v in mjd])
    flux = np.asarray([float(v) for v in flux])
    err = np.asarray([float(v) for v in err])
    bnum = np.asarray(
        [
            FILTER_DICT[b] if isinstance(b, str) else int(b)
            for b in band
        ],
        dtype=np.float64,
    )
    mjd = mjd - mjd[0]

    def norm(col):
        if len(col) == 1:
            return np.array([1.0])
        ptp = np.ptp(col)
        if ptp == 0.0:
            return np.zeros_like(col)
        return (col - col.min()) / ptp

    rows = np.stack([mjd, norm(flux), norm(err), bnum], axis=1).astype(
        np.float32
    )
    if len(rows) > maxlen:  # keras truncating='pre': keep the LAST steps
        rows = rows[-maxlen:]
    out = np.full((maxlen, 4), np.float32(PAD))
    out[:, 3] = 0.0  # band pads with 0
    out[: len(rows)] = rows
    return out


def cats_alert_scores(
    df,
    mjd_col="cmidpointMjdTai",
    flux_col="cpsfFlux",
    err_col="cpsfFluxErr",
    band_col="cband",
    out_col="cats_preds",
    model_path: str | None = None,
):
    """Score alert-shaped rows (history array columns) with the REAL
    CATS network: one Arrow-batched mapInPandas stage appending
    ``out_col`` (array<double> of 5 class probabilities; <2-point curves
    get the reference's all-zero vector)."""
    import pandas as pd
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    if model_path is None:
        model_path = checkpoint_path()
    schema = StructType(
        df.schema.fields + [StructField(out_col, ArrayType(DoubleType()), True)]
    )

    def kernel(batches):
        art = load_cats(model_path)
        for pdf in batches:
            seqs, keep = [], []
            for i in range(len(pdf)):
                mjd = pdf[mjd_col].iloc[i]
                if mjd is None or len(mjd) < 2:
                    continue
                seqs.append(
                    cats_format_inputs(
                        mjd,
                        pdf[flux_col].iloc[i],
                        pdf[err_col].iloc[i],
                        pdf[band_col].iloc[i],
                    )
                )
                keep.append(i)
            preds = [[0.0] * len(CLASSES) for _ in range(len(pdf))]
            if seqs:
                probs = cats_forward_batch(np.stack(seqs), art)
                for i, p in zip(keep, probs):
                    preds[i] = [float(x) for x in p]
            out = pdf.copy()
            out[out_col] = preds
            yield out

    return df.mapInPandas(kernel, schema=schema)
