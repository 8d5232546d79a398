"""The REAL quantized T2 transformer from the reference's .tflite.

The reference ships ``quantized-model-GR-noZ-...-LL0.836.tflite`` (the
ELAsTiCC-era 14-class time-domain transformer; unreferenced by current
reference code — the engine carries it to complete the shipped-model
inventory). ``tools/extract_tflite.py`` decodes the FlatBuffer with
stdlib struct and dequantizes the int8 tensors at transcription time
(per-tensor symmetric scales, zero-point 0 — verified); this module
reimplements the graph's exact dataflow in numpy:

input [T=100, C=2 (g, r series)]
→ pointwise Conv1D 2→32 with fused ReLU (VALID, k=1)
→ + positional-encoding constant [100, 32]
→ one post-LN transformer block: 16-head self-attention with head_dim
  2 (Q = dense, K = dense_1, V = dense_2, O = dense_3 — wiring traced
  from the BATCH_MATMUL operand order; scale 1/√2), residual + LN
  (eps 1e-6); LINEAR 32→128→32 FFN (the flatbuffer records
  fused_activation NONE on both dense layers — followed verbatim),
  residual + LN
→ global average pool over time → dense 32→14 (the weight-clustered
  layer's stored dequantized matrix) → softmax.

Not SQL-expressible (attention); registered queries using it are
rows-only by documented design, like ``cats_real``.
"""

from __future__ import annotations

import gzip
import json
import os

import numpy as np

from fink_science_spark.operators.enrich import ExecutorRegistry

_DEFAULT = os.path.join(
    os.path.dirname(__file__), "..", "data", "t2_tflite.json.gz"
)

T2_SEQ_LEN = 100
T2_N_CLASSES = 14


def checkpoint_path() -> str:
    return os.environ.get(
        "SPARK_GRAFT_T2_CKPT", os.path.normpath(_DEFAULT)
    )


def load_t2(path: str | None = None) -> dict:
    p = path or checkpoint_path()

    def _load():
        with gzip.open(p, "rt") as f:
            raw = json.load(f)
        art = {
            k: np.asarray(v, dtype=np.float64)
            if isinstance(v, list)
            else v
            for k, v in raw.items()
        }
        art["conv_w2d"] = art["conv_w"].reshape(32, 2)  # [out,1,1,in]
        art["pos2d"] = art["pos"][0]  # [100, 32]
        return art

    return ExecutorRegistry.get(f"t2_ckpt_v1:{p}", _load)


def _layer_norm(x: np.ndarray, gamma, beta, eps: float) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * gamma + beta


# Executor-lifetime scratch buffers for the attention temporaries. The
# (B,H,T,T) score tensor is the one large allocation of the model; on
# this class of VM, FIRST-TOUCH page faults on fresh large mmap'ed
# buffers cost ~0.5 ms/page (measured: np.exp over a fresh 192 MB array
# 36 s vs 0.08 s into warm memory), so the kernel (a) processes rows in
# chunks small enough that every temporary stays modest and (b) reuses
# the same buffers across chunks, batches, and queries via out=.
_SCRATCH: dict = {}
_CHUNK = 16


def _buf(key: str, shape: tuple) -> np.ndarray:
    b = _SCRATCH.get(key)
    if b is None or b.shape != shape:
        b = np.empty(shape)
        _SCRATCH[key] = b
    return b


def _forward_chunk(X: np.ndarray, art: dict) -> np.ndarray:
    B, T, _ = X.shape
    H, D = int(art["num_heads"]), int(art["head_dim"])
    eps = float(art["ln_eps"])

    h = np.maximum(X @ art["conv_w2d"].T + art["conv_b"], 0.0)
    h = h + art["pos2d"]

    def heads(m):
        # [B,T,HD] → [B,H,T,D]
        return m.reshape(B, T, H, D).transpose(0, 2, 1, 3)

    q = heads(h @ art["wq"].T + art["bq"])
    k = heads(h @ art["wk"].T + art["bk"])
    v = heads(h @ art["wv"].T + art["bv"])
    scores = _buf("scores", (B, H, T, T))
    np.matmul(q, k.transpose(0, 1, 3, 2), out=scores)
    scores *= float(art["attn_scale"])
    scores -= scores.max(axis=-1, keepdims=True)
    np.exp(scores, out=scores)
    scores /= scores.sum(axis=-1, keepdims=True)
    ctx = (scores @ v).transpose(0, 2, 1, 3).reshape(B, T, H * D)
    out = ctx @ art["wo"].T + art["bo"]
    h = _layer_norm(h + out, art["ln1_gamma"], art["ln1_beta"], eps)

    f = h @ art["w_ffn1"].T + art["b_ffn1"]
    f = f @ art["w_ffn2"].T + art["b_ffn2"]
    h = _layer_norm(h + f, art["ln2_gamma"], art["ln2_beta"], eps)

    z = h.mean(axis=1)
    logits = z @ art["w_out"].T + art["b_out"]
    logits = logits - logits.max(axis=-1, keepdims=True)
    ez = np.exp(logits)
    return ez / ez.sum(axis=-1, keepdims=True)


def t2_forward_batch(X: np.ndarray, art: dict) -> np.ndarray:
    """(B, 100, 2) → (B, 14) class probabilities (chunked; see
    _SCRATCH note)."""
    X = np.asarray(X, dtype=np.float64)
    B = len(X)
    out = np.empty((B, int(art["n_classes"])))
    for s in range(0, B, _CHUNK):
        e = min(s + _CHUNK, B)
        out[s:e] = _forward_chunk(X[s:e], art)
    return out
