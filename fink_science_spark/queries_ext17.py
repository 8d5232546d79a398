"""Wave 19 — REAL extracted model weights driving registered queries.

Round-6 centerpiece: the reference's actual trained artifacts,
transcribed with stdlib tooling (no torch / sklearn / onnx imports),
executed Spark-first with exact DuckDB oracles.

* ``snn_ia_real`` — the REAL SuperNNova 2-layer bidirectional LSTM
  (35,970 parameters from ztf snn_snia_vs_nonia/model.pt,
  ztf/snn/processor.py:84-210) scoring per-user event sequences. The
  Spark side runs the production Arrow kernel (mapInPandas, batched
  numpy); the oracle unrolls the identical recurrence as ~100 chained
  DuckDB CTEs over DOUBLE[] list columns with every weight embedded as
  a list literal. Real-alert value parity for the same kernel is pinned
  in tests/test_snn_lstm_real.py against the reference's shipped
  production scores.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fink_science_spark.queries import _events_us

# --------------------------------------------------------------------------
# snn_ia_real
# --------------------------------------------------------------------------

_K = 8  # fixed unroll depth: first K events per user (time order)

# synthetic-photometry mapping (documented, engine-side AND oracle-side):
# odd steps observe g, even steps observe r; mag = 10 + value/32;
# sigma = 0.01 + |value|/1000. Exercises the full real-weight path:
# SNANA conversion, log-standardization with the model's data_norm
# constants, one-hot band flags, delta_time in days.


def q_snn_ia_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from fink_science_spark.operators.snn_lstm import (
        INPUT_DIM,
        checkpoint_path,
        load_snn_lstm,
        mag2fluxcal_snana_np,
        norm_feature,
        snn_forward_batch,
    )

    ev = _events_us(spark, sf_dir)
    grouped = (
        ev.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("ts_us"), F.col("value")))
            ).alias("h")
        )
        .select(
            "user_id",
            F.slice(F.col("h.ts_us"), 1, _K).alias("ts_arr"),
            F.slice(F.col("h.value"), 1, _K).alias("val_arr"),
            F.least(F.size("h"), F.lit(_K)).alias("n"),
        )
    )
    model_path = checkpoint_path()
    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n", IntegerType()),
            StructField("snn_ia_real", DoubleType()),
        ]
    )

    def kernel(batches):
        art = load_snn_lstm(model_path)
        w, norm = art["tensors"], art["norm"]
        for pdf in batches:
            seqs = []
            for i in range(len(pdf)):
                ts = np.asarray(pdf["ts_arr"].iloc[i], dtype=np.float64)
                vals = np.asarray(pdf["val_arr"].iloc[i], dtype=np.float64)
                n = len(vals)
                X = np.zeros((n, INPUT_DIM))
                mag = 10.0 + vals / 32.0
                sig = 0.01 + np.abs(vals) / 1000.0
                flux, err = mag2fluxcal_snana_np(mag, sig)
                for t in range(n):
                    is_g = (t + 1) % 2 == 1
                    fg = flux[t] if is_g else 0.0
                    fr = 0.0 if is_g else flux[t]
                    eg = err[t] if is_g else 0.0
                    er = 0.0 if is_g else err[t]
                    dt = 0.0 if t == 0 else (ts[t] - ts[t - 1]) / 86400e6
                    X[t, 0] = norm_feature(fg, norm["FLUXCAL_g"])
                    X[t, 1] = norm_feature(fr, norm["FLUXCAL_r"])
                    X[t, 2] = norm_feature(eg, norm["FLUXCALERR_g"])
                    X[t, 3] = norm_feature(er, norm["FLUXCALERR_r"])
                    X[t, 4] = norm_feature(dt, norm["delta_time"])
                    X[t, 5] = 1.0 if is_g else 0.0
                    X[t, 7] = 0.0 if is_g else 1.0
                seqs.append(X)
            probs = snn_forward_batch(
                seqs, w, dtype=np.float64, sql_exact=True
            )
            out = pdf[["user_id", "n"]].copy()
            out["snn_ia_real"] = np.round(probs, 6)
            yield out

    return grouped.mapInPandas(kernel, schema=schema).select(
        "user_id", "n", "snn_ia_real"
    )


def _oracle_snn_real() -> str:
    from fink_science_spark.operators.snn_lstm import (
        load_snn_lstm,
        snn_lstm_sql,
        snn_weight_cte,
    )
    from fink_science_spark.operators.snn_norm import snn_norm_sql

    norm = load_snn_lstm()["norm"]

    def feat(t: int) -> str:
        """8 feature expressions for step t (1-indexed), as a DOUBLE[]."""
        val = f"val_arr[{t}]"
        is_g = (t % 2) == 1
        mag = f"(10.0 + {val} / 32.0)"
        sig = f"(0.01 + abs({val}) / 1000.0)"
        flux = f"(pow(10.0, -0.4 * {mag}) * 1e11)"
        err = f"(9.21034e10 * exp(-0.921034 * {mag}) * {sig})"
        fg, fr = (flux, "0.0") if is_g else ("0.0", flux)
        eg, er = (err, "0.0") if is_g else ("0.0", err)
        if t == 1:
            dt = "0.0"
        else:
            dt = f"((ts_arr[{t}] - ts_arr[{t - 1}]) / 86400e6)"
        oh = ["1.0", "0.0", "0.0"] if is_g else ["0.0", "0.0", "1.0"]
        feats = [
            snn_norm_sql(fg, norm["FLUXCAL_g"]),
            snn_norm_sql(fr, norm["FLUXCAL_r"]),
            snn_norm_sql(eg, norm["FLUXCALERR_g"]),
            snn_norm_sql(er, norm["FLUXCALERR_r"]),
            snn_norm_sql(dt, norm["delta_time"]),
        ] + oh
        # pad steps produce garbage (val_arr[t] NULL -> NULL features);
        # guard to 0.0 so the list stays well-typed. Pad steps never
        # contribute: the recurrence carries state through t > n.
        zeros = "[" + ",".join(["0.0"] * 8) + "]::DOUBLE[]"
        return (
            f"CASE WHEN {t} <= n THEN [" + ",".join(feats) + "]::DOUBLE[] "
            f"ELSE {zeros} END"
        )

    xs = "[" + ",".join(feat(t) for t in range(1, _K + 1)) + "]"
    wcte = snn_weight_cte(load_snn_lstm()["tensors"])
    ctes, last, prob = snn_lstm_sql(_K, "feat")
    return f"""
WITH grouped AS (
  SELECT user_id,
         list(epoch_us(ts) ORDER BY epoch_us(ts), value) AS ts_all,
         list(value ORDER BY epoch_us(ts), value) AS val_all,
         count(*) AS cnt
  FROM events GROUP BY user_id
),
sliced AS (
  SELECT user_id, ts_all[1:{_K}] AS ts_arr, val_all[1:{_K}] AS val_arr,
         CAST(least(cnt, {_K}) AS INTEGER) AS n
  FROM grouped
),
{wcte},
feat AS (
  SELECT *, {xs} AS xs FROM sliced CROSS JOIN w
),
{ctes}
SELECT user_id, n, round({prob}, 6) AS snn_ia_real
FROM {last}
"""


ORACLE_SNN_IA_REAL = None  # built lazily: see ORACLES_EXT17 below


def _lazy_oracles() -> dict[str, str]:
    return {"snn_ia_real": _oracle_snn_real()}


QUERIES_EXT17 = {
    "snn_ia_real": q_snn_ia_real,
}


class _LazyOracles(dict):
    """Oracle SQL for this wave embeds ~36k weight literals; build it on
    first access instead of at import."""

    def __init__(self):
        super().__init__()
        self._built = False

    def _ensure(self):
        if not self._built:
            super().update(_lazy_oracles())
            self._built = True

    def __getitem__(self, k):
        self._ensure()
        return super().__getitem__(k)

    def __contains__(self, k):
        self._ensure()
        return super().__contains__(k)

    def __iter__(self):
        self._ensure()
        return super().__iter__()

    def keys(self):
        self._ensure()
        return super().keys()

    def items(self):
        self._ensure()
        return super().items()

    def __len__(self):
        self._ensure()
        return super().__len__()


ORACLES_EXT17 = _LazyOracles()
