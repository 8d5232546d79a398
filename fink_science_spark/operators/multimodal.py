"""Multimodal (binary) column plumbing: images/audio/video as opaque
``binary`` columns with typed metadata, processed in Arrow batches.

The reference decodes gzipped FITS image stamps from a
``struct<fileName string, stampData binary>`` column inside UDFs
(reference semantics: ztf/hostless_detection/pipeline_utils.py:46-57).
This module generalizes that to the training-data-pipeline shape:

    blob column + metadata struct → mapInPandas decode/feature kernel
    → typed feature columns

The decode step itself needs image/audio libraries that are not in this
environment, so the codec boundary is explicit: :func:`register_codec`
installs a real decoder; the built-in ``"fake"`` codec is a deterministic
stand-in (byte-length / first-bytes features) that keeps every piece of
Spark plumbing — schema, Arrow batch shape, partition sizing — real and
testable. Real deployments register e.g. a PIL/ffmpeg codec with the same
signature.

At 100 TB: blobs dominate row size, so the operators (a) never shuffle
blob columns (features are extracted before any join/agg), (b) use
``mapInPandas`` so one Arrow batch holds only
``spark.sql.execution.arrow.maxRecordsPerBatch`` blobs, bounding executor
memory, and (c) drop the blob column as the first projection after
feature extraction.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = "byte_len int, first_byte int, checksum int"

_CODECS: dict[str, tuple[Callable[[bytes], dict], str]] = {}


def register_codec(
    name: str, fn: Callable[[bytes], dict], schema: str = DECODE_SCHEMA
) -> None:
    """Install a blob decoder: bytes → {feature: value} dict, plus the
    Spark DDL schema of the emitted features (every codec owns its own
    output shape)."""
    _CODECS[name] = (fn, schema)


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in decoder: structural byte features only.
    Real image decode (PIL/cv2) is not available in this environment —
    swap via register_codec("image", ...)."""
    if blob is None:
        return {"byte_len": 0, "first_byte": -1, "checksum": 0}
    return {
        "byte_len": len(blob),
        "first_byte": blob[0] if blob else -1,
        "checksum": sum(blob[:64]) % 997,
    }


def _gzip_decode(blob: bytes) -> dict:
    """REAL decode path (stdlib, no image libs needed): gunzip the blob —
    the reference's stamp decode is exactly gzip.open(...).read() over
    ``cutout{Science,Template,Difference}`` payloads
    (ztf/hostless_detection/pipeline_utils.py:46-57) — and fingerprint
    the decompressed payload (length + md5). md5 makes the roundtrip
    differentially testable: any engine can hash the expected payload."""
    import gzip
    import hashlib

    if blob is None:
        return {"payload_len": 0, "payload_md5": ""}
    raw = gzip.decompress(bytes(blob))
    return {
        "payload_len": len(raw),
        "payload_md5": hashlib.md5(raw).hexdigest(),
    }


PCM_FRAME = 25  # samples per analysis frame


def _pcm8_decode(blob: bytes) -> dict:
    """Audio-shaped decode path: interpret the blob as unsigned 8-bit PCM
    centered at 128 and emit frame-energy features (the waveform
    analogue of the image stamp statistics). All-integer arithmetic, so
    the features are EXACTLY reproducible by any engine that can read
    byte values — the differential oracle recomputes them from ASCII
    codes in SQL. A real audio codec (soundfile/ffmpeg) slots in via
    register_codec with the same signature."""
    import numpy as np

    if not blob:
        return {
            "n_samples": 0,
            "n_frames": 0,
            "total_energy": 0,
            "max_frame_energy": 0,
        }
    s = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
    e = (s - 128) ** 2
    frames = np.add.reduceat(e, np.arange(0, len(e), PCM_FRAME))
    return {
        "n_samples": int(len(s)),
        "n_frames": int(len(frames)),
        "total_energy": int(e.sum()),
        "max_frame_energy": int(frames.max()),
    }


register_codec("fake", _fake_decode)
register_codec("gzip", _gzip_decode, schema="payload_len long, payload_md5 string")
register_codec(
    "pcm8",
    _pcm8_decode,
    schema="n_samples int, n_frames int, total_energy long, max_frame_energy long",
)


def decode_image(blob: bytes):  # pragma: no cover - explicit stub
    """Real image decoding requires PIL/cv2, absent in this container."""
    raise NotImplementedError(
        "image decode requires an image library; register a codec via "
        "register_codec('image', fn)"
    )


def extract_blob_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    codec: str = "fake",
) -> DataFrame:
    """mapInPandas feature extraction over a binary column.

    Returns (id_col, *codec features); the blob column is projected away
    before anything downstream can shuffle it."""
    fn, schema = _CODECS[codec]
    out_schema = f"{id_col} long, {schema}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                # pd.DataFrame([]) would carry zero feature columns and
                # fail the mapInPandas schema check
                continue
            feats = pdf[blob_col].map(fn)
            out = pd.DataFrame(list(feats))
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def image_matrix_stats(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int = 4,
    height: int = 4,
    gzip_input: bool = False,
) -> DataFrame:
    """Image-shaped statistics over a decoded pixel matrix — the
    hostless-detection analysis shape (reference: sigma-clip + statistic
    over the 63×63 cutout stamp, ztf/hostless_detection/
    pipeline_utils.py:109-176), with the deterministic byte decode
    standing in for FITS (real decoders slot in via register_codec).

    Per blob: interpret the first width×height bytes as a row-major
    matrix; emit pixel mean/max, the 2σ-clipped mean (pixels ≤ mean +
    2·population-std — one-sided clip like the reference's bright-source
    masking), and center−edge contrast (interior mean minus border mean).
    numpy per Arrow batch; blob never leaves the kernel.

    ``gzip_input=True`` gunzips each blob first — the reference's actual
    stamp layout (gzip-compressed FITS payload) end to end."""
    import numpy as np

    out_schema = (
        f"{id_col} long, px_mean double, px_max int, clipped_mean double, "
        "contrast double"
    )
    n_px = width * height
    interior = np.zeros((height, width), dtype=bool)
    interior[1 : height - 1, 1 : width - 1] = True
    flat_interior = interior.ravel()

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, means, maxs, clipped, contrasts = [], [], [], [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                raw = bytes(blob)
                if gzip_input:
                    import gzip

                    raw = gzip.decompress(raw)
                if len(raw) < n_px:
                    continue
                px = np.frombuffer(raw[:n_px], dtype=np.uint8).astype(
                    np.float64
                )
                mean = px.mean()
                std = px.std()  # population
                keep = px <= mean + 2.0 * std
                ids.append(rid)
                means.append(float(mean))
                maxs.append(int(px.max()))
                clipped.append(float(px[keep].mean()))
                contrasts.append(
                    float(px[flat_interior].mean() - px[~flat_interior].mean())
                )
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "px_mean": means,
                    "px_max": maxs,
                    "clipped_mean": clipped,
                    "contrast": contrasts,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def image_ahash(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int = 8,
    height: int = 8,
    bits: int = 60,
) -> DataFrame:
    """Average-hash (aHash) perceptual signature over a decoded pixel
    matrix: bit j = (pixel_j > mean of all pixels), packed little-endian
    into one BIGINT over the first ``bits`` pixels (60 keeps the engine's
    portable signed-BIGINT hash convention; the mean still uses every
    pixel). The canonical image near-dup primitive — real decoders slot
    in via register_codec exactly as for image_matrix_stats; pixel bytes
    never leave the Arrow kernel.

    The mean is an exact sum/(width*height) in float64 — identical in
    numpy and any SQL engine when width*height is a power of two, so the
    strict > comparison is engine-portable (the DuckDB oracle reproduces
    signatures bit-for-bit)."""
    import numpy as np

    n_px = width * height
    out_schema = f"{id_col} long, ahash long"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, sigs = [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None or len(blob) < n_px:
                    continue
                px = np.frombuffer(bytes(blob)[:n_px], dtype=np.uint8).astype(
                    np.float64
                )
                mean = px.mean()
                above = px[:bits] > mean
                sig = 0
                for j in np.nonzero(above)[0]:
                    sig |= 1 << int(j)
                ids.append(rid)
                sigs.append(sig)
            yield pd.DataFrame({id_col: ids, "ahash": sigs})

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    frame_size: int = 256,
    stride: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """Frame/chunk sampling of a binary payload (the video/audio shape):
    emit up to ``max_frames`` fixed-size byte windows per blob as
    (id, frame_idx, frame_bytes). Pure Spark byte slicing — no Python."""
    idx = F.sequence(F.lit(0), F.lit(max_frames - 1))
    frames = df.select(
        F.col(id_col),
        F.posexplode(idx).alias("frame_idx", "__i"),
        F.col(blob_col).alias("__blob"),
    ).select(
        id_col,
        "frame_idx",
        F.expr(f"substring(__blob, frame_idx * {stride} + 1, {frame_size})").alias(
            "frame_bytes"
        ),
    )
    return frames.filter(F.length("frame_bytes") > 0)


def window_mad(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    n_bytes: int = 16,
    center: int = 128,
) -> DataFrame:
    """Mean absolute deviation of a byte window from ``center`` — the
    pcm8 silence/loudness feature (|sample − 128| averaged over the
    window). Integer sum inside the kernel, one exact /n at the end, so
    the differential oracle reproduces it bit-for-bit from byte values
    in SQL. numpy per Arrow batch; bytes never leave the kernel."""
    import numpy as np

    out_schema = f"{id_col} long, mad double"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, mads = [], []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                raw = bytes(blob)[:n_bytes]
                if len(raw) < n_bytes:
                    continue
                s = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                ids.append(rid)
                mads.append(float(np.abs(s - center).sum() / n_bytes))
            yield pd.DataFrame({id_col: ids, "mad": mads})

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)


def image_resize_pool(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    width: int = 4,
    height: int = 4,
    factor: int = 2,
) -> DataFrame:
    """Average-pool image resize — the thumbnail/downsample stage of a
    multimodal ingest pipeline (the brief's decode → resize →
    feature-extract chain), on the same deterministic byte-matrix decode
    as :func:`image_matrix_stats` (a real decoder slots in via
    register_codec, nothing downstream changes).

    Per blob: interpret the first width×height bytes as a row-major
    matrix, average each factor×factor block (one numpy reshape-mean per
    Arrow batch), and emit the pooled matrix row-major as
    ``array<double>`` plus its mean. Block averages of uint8 pixels are
    exact multiples of 1/factor², so the 6-decimal rounding is exact and
    any SQL engine reproduces the thumbnail bit-for-bit. Pixel bytes
    never leave the kernel — only (id, (W·H)/factor² doubles) shuffle.
    """
    import numpy as np

    assert width % factor == 0 and height % factor == 0
    n_px = width * height
    out_schema = f"{id_col} long, thumb array<double>, thumb_mean double"

    def run(batches):
        import pandas as pd

        for pdf in batches:
            ids, thumbs, means = [], [], []
            for i, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    # missing stamp: skip like the sibling kernels
                    # (image_matrix_stats / image_ahash) instead of
                    # crashing the task on bytes(None)
                    continue
                b = bytes(blob)[:n_px]
                if len(b) < n_px:
                    b = b + b"\x00" * (n_px - len(b))
                m = np.frombuffer(b, dtype=np.uint8).astype(np.float64)
                m = m.reshape(height // factor, factor, width // factor, factor)
                pooled = m.mean(axis=(1, 3)).ravel()
                ids.append(int(i))
                thumbs.append([round(float(x), 6) for x in pooled])
                means.append(round(float(pooled.mean()), 6))
            yield pd.DataFrame(
                {id_col: ids, "thumb": thumbs, "thumb_mean": means}
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=out_schema)
