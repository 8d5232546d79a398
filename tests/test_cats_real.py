"""Value-level parity for the REAL CATS TensorFlow weights.

1. The committed checkpoint is a bit-exact transcription of the
   SavedModel's TensorBundle (fresh stdlib re-extraction compared
   bytewise), with the forward/backward LSTM assignment read off the
   checkpoint object graph rather than guessed.
2. The vectorized forward equals an independently written per-layer
   scalar implementation on short random sequences.
3. Keras semantics unit checks: 'same' conv right-pad, SE channel gate,
   bidirectional last-output alignment.
4. Real-alert smoke on the reference's 50-packet Rubin or4 sample
   (inputs built exactly like rubin/cats/processor.py:118-158): valid
   probability simplex, non-degenerate class spread. No
   reference-computed CATS outputs ship in the sample, so this is a
   behavior/stability pin, not a value pin (unlike the SNN family).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

MODEL_DIR = (
    "/root/reference/fink_science/data/models/cats_models/"
    "cats_small_nometa_serial_219_savedmodel"
)
OR4 = "/root/reference/fink_science/data/alerts/or4_lsst7.1"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(MODEL_DIR), reason="reference CATS savedmodel absent"
)
needs_or4 = pytest.mark.skipif(
    not os.path.isdir(OR4), reason="reference or4 sample absent"
)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@needs_ref
def test_checkpoint_verbatim_vs_savedmodel():
    from extract_tf_cats import LAYER_MAP, LSTM_MAP, load_savedmodel_weights

    from fink_science_spark.operators.cats_nn import load_cats

    raw = load_savedmodel_weights(MODEL_DIR)
    art = load_cats()
    n = 0
    for alias, path in LAYER_MAP.items():
        for attr in ("kernel", "bias", "gamma", "beta", "moving_mean",
                     "moving_variance"):
            k = f"{path}/{attr}"
            if k in raw:
                assert raw[k].tobytes() == art["tensors"][f"{alias}/{attr}"].tobytes(), k
                n += 1
    for alias, path in LSTM_MAP.items():
        for attr in ("kernel", "recurrent_kernel", "bias"):
            assert (
                raw[f"{path}/{attr}"].tobytes()
                == art["tensors"][f"{alias}/{attr}"].tobytes()
            )
            n += 1
    assert n == 40


def _scalar_forward(X, art):
    """Independent scalar implementation: python loops per time step and
    channel group, structured unlike the vectorized kernel."""
    w = {k: np.asarray(v, dtype=np.float64) for k, v in art["tensors"].items()}
    import math

    def sig(v):
        if v >= 0:
            return 1.0 / (1.0 + math.exp(-min(v, 80.0)))
        return 1.0 - 1.0 / (1.0 + math.exp(-min(-v, 80.0)))

    x = [list(map(float, row)) for row in X]
    L = len(x)
    for blk in (1, 2, 3):
        k = w[f"conv{blk}/kernel"]
        b = w[f"conv{blk}/bias"]
        cin, cout = k.shape[1], k.shape[2]
        y = []
        for t in range(L):
            nxt = x[t + 1] if t + 1 < L else [0.0] * cin
            row = []
            for o in range(cout):
                v = b[o]
                for j in range(cin):
                    v += x[t][j] * k[0][j][o] + nxt[j] * k[1][j][o]
                row.append(v)
            y.append(row)
        g, be = w[f"bn{blk}/gamma"], w[f"bn{blk}/beta"]
        mu, var = w[f"bn{blk}/moving_mean"], w[f"bn{blk}/moving_variance"]
        y = [
            [
                g[o] * (row[o] - mu[o]) / math.sqrt(var[o] + 1e-3) + be[o]
                for o in range(cout)
            ]
            for row in y
        ]
        y = [[v * sig(v) for v in row] for row in y]
        pooled = [sum(row[o] for row in y) / L for o in range(cout)]
        r = w[f"se{blk}_reduce/kernel"]
        e = w[f"se{blk}_expand/kernel"]
        mid = [
            max(0.0, sum(pooled[j] * r[j][m] for j in range(cout)))
            for m in range(r.shape[1])
        ]
        gate = [
            sig(sum(mid[m] * e[m][o] for m in range(len(mid))))
            for o in range(cout)
        ]
        x = [[row[o] * gate[o] for o in range(cout)] for row in y]
    conv_feat = [max(row[o] for row in x) for o in range(len(x[0]))]

    def lstm(seq, name, rev):
        kk = w[f"{name}/kernel"]
        rr = w[f"{name}/recurrent_kernel"]
        bb = w[f"{name}/bias"]
        H = rr.shape[0]
        h = [0.0] * H
        c = [0.0] * H
        outs = {}
        order = range(len(seq) - 1, -1, -1) if rev else range(len(seq))
        for t in order:
            z = [
                bb[m]
                + sum(seq[t][j] * kk[j][m] for j in range(len(seq[t])))
                + sum(h[j] * rr[j][m] for j in range(H))
                for m in range(4 * H)
            ]
            c = [
                sig(z[H + m]) * c[m] + sig(z[m]) * math.tanh(z[2 * H + m])
                for m in range(H)
            ]
            h = [sig(z[3 * H + m]) * math.tanh(c[m]) for m in range(H)]
            outs[t] = h
        return [outs[t] for t in range(len(seq))]

    xs = [list(map(float, row)) for row in X]
    f1 = lstm(xs, "lstm1_fwd", False)
    b1 = lstm(xs, "lstm1_bwd", True)
    seq = [f1[t] + b1[t] for t in range(L)]
    f2 = lstm(seq, "lstm2_fwd", False)
    b2 = lstm(seq, "lstm2_bwd", True)
    feat = f2[-1] + b2[0] + conv_feat
    hk, hb = w["head/kernel"], w["head/bias"]
    z = [
        hb[o] + sum(feat[j] * hk[j][o] for j in range(len(feat)))
        for o in range(hk.shape[1])
    ]
    alpha = art["arch"]["leaky_relu_alpha"]
    z = [v if v > 0 else alpha * v for v in z]
    ok, ob = w["out/kernel"], w["out/bias"]
    logits = [
        ob[o] + sum(z[j] * ok[j][o] for j in range(len(z)))
        for o in range(5)
    ]
    mx = max(logits)
    es = [math.exp(v - mx) for v in logits]
    return [v / sum(es) for v in es]


def test_forward_matches_independent_scalar_implementation():
    from fink_science_spark.operators.cats_nn import (
        cats_forward_batch,
        load_cats,
    )

    art = load_cats()
    rng = np.random.default_rng(23)
    X = rng.uniform(-1.5, 1.5, size=(7, 4)).astype(np.float32)
    got = cats_forward_batch(X[None], art)[0]
    # scalar reference runs in float64; agreement bounded by f32 noise
    want = _scalar_forward(X, art)
    assert np.allclose(got, want, atol=5e-4), (got, want)
    assert abs(got.sum() - 1.0) < 1e-5


def test_format_inputs_reference_semantics():
    from fink_science_spark.operators.cats_nn import cats_format_inputs

    X = cats_format_inputs(
        [60000.0, 60001.5, 60004.0],
        [100.0, 300.0, 200.0],
        [10.0, 10.0, 30.0],
        ["g", "r", "y"],
        maxlen=6,
    )
    assert X.shape == (6, 4)
    assert np.allclose(X[:3, 0], [0.0, 1.5, 4.0])
    assert np.allclose(X[:3, 1], [0.0, 1.0, 0.5])  # min-max flux
    assert np.allclose(X[:3, 3], [2, 3, 6])
    assert np.all(X[3:, :3] == -999.0) and np.all(X[3:, 3] == 0.0)
    # truncating='pre' keeps the LAST maxlen steps
    Xt = cats_format_inputs(
        list(range(10)), list(range(10)), [1.0] * 10, [1] * 10, maxlen=4
    )
    assert np.allclose(Xt[:, 0], [6, 7, 8, 9])


@needs_or4
def test_real_rubin_alerts_smoke(spark):
    """Score 50 REAL Rubin or4 packets through the Spark operator:
    valid simplex rows for every >=2-point curve, and the class
    distribution is non-degenerate."""
    from pyspark.sql import functions as F

    from fink_science_spark.operators.cats_nn import cats_alert_scores

    df = spark.read.parquet(OR4)
    empty = F.array().cast("array<double>")
    strempty = F.array().cast("array<string>")

    def hist(field, caster, ee):
        return F.concat(
            F.coalesce(F.col(f"prvDiaSources.{field}").cast(caster), ee),
            F.array(F.col(f"diaSource.{field}")).cast(caster),
        )

    frame = df.select(
        hist("midpointMjdTai", "array<double>", empty).alias(
            "cmidpointMjdTai"
        ),
        hist("psfFlux", "array<double>", empty).alias("cpsfFlux"),
        hist("psfFluxErr", "array<double>", empty).alias("cpsfFluxErr"),
        hist("band", "array<string>", strempty).alias("cband"),
    )
    pdf = cats_alert_scores(frame).select("cats_preds").toPandas()
    assert len(pdf) == 50
    probs = np.array(pdf["cats_preds"].tolist())
    scored = probs.sum(axis=1) > 0
    assert scored.sum() >= 40  # most packets carry >=2 detections
    assert np.allclose(probs[scored].sum(axis=1), 1.0, atol=1e-5)
    assert (probs[scored] >= 0).all()
    argmax = probs[scored].argmax(axis=1)
    assert len(set(argmax.tolist())) >= 2, "degenerate class assignment"
