"""Pure-Python FITS binary-table (BINTABLE) reader/writer.

The reference loads catalog tables from FITS through astropy —
`ztf/xmatch/utils.py:118-150` reads the 4LAC AGN catalog's BINTABLE
extension and keeps (name, ra, dec, class) columns. astropy is absent
from this container, so the at-rest format is implemented directly from
the PUBLIC FITS 4.0 standard (NASA/IAUFWG), the relevant subset:

- an HDU = header of 2880-byte blocks (36 cards × 80 ASCII bytes, ``END``
  terminates, data padded to 2880);
- BINTABLE extension: ``NAXIS1`` bytes/row, ``NAXIS2`` rows, ``TFIELDS``
  columns, ``TTYPEn`` names, ``TFORMn`` formats, data stored big-endian
  row-major — exactly a numpy structured dtype, so the whole table reads
  as ONE ``np.frombuffer``, no per-cell Python;
- supported TFORMs: ``L`` logical, ``B`` uint8, ``I`` int16, ``J`` int32,
  ``K`` int64, ``E`` float32, ``D`` float64, ``rA`` fixed-width strings.

The writer emits the same subset deterministically (tests' stand-in for
an upstream catalog release). Scale note: FITS catalogs here are
BROADCAST-side tables (≤ a few 10⁶ rows); the read is a driver-side
bridge into ``CatalogRegistry.register_pandas``, which is the documented
contract for every catalog format.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

BLOCK = 2880
CARD = 80

# TFORM letter → (numpy big-endian dtype, bytes)
_TFORM = {
    "L": ("u1", 1),  # logical stored as 'T'/'F' bytes — decoded below
    "B": ("u1", 1),
    "I": (">i2", 2),
    "J": (">i4", 4),
    "K": (">i8", 8),
    "E": (">f4", 4),
    "D": (">f8", 8),
}


def _cards(header_bytes: bytes) -> dict:
    out = {}
    for i in range(0, len(header_bytes), CARD):
        card = header_bytes[i : i + CARD].decode("ascii")
        key = card[:8].strip()
        if key == "END":
            break
        if "=" not in card:
            continue
        raw = card[10:]
        # quoted strings first: '/' is the comment separator only AFTER
        # the closing quote — a slash inside the quotes is part of the
        # value (e.g. a '2026/08/14' date string); '' escapes a quote
        if raw.lstrip().startswith("'"):
            body = raw.lstrip()[1:]
            end, i = [], 0
            while i < len(body):
                if body[i] == "'":
                    if i + 1 < len(body) and body[i + 1] == "'":
                        end.append("'")
                        i += 2
                        continue
                    break
                end.append(body[i])
                i += 1
            out[key] = "".join(end).strip()
            continue
        val = raw.split("/")[0].strip()
        if val in ("T", "F"):
            out[key] = val == "T"
        else:
            try:
                out[key] = int(val)
            except ValueError:
                try:
                    out[key] = float(val)
                except ValueError:
                    out[key] = val
    return out


def _read_header(f) -> dict:
    raw = b""
    while True:
        block = f.read(BLOCK)
        if len(block) != BLOCK:
            raise EOFError("truncated FITS header")
        raw += block
        for i in range(0, len(raw), CARD):
            if raw[i : i + 8].rstrip() == b"END":
                return _cards(raw)


def _skip_data(f, header: dict) -> None:
    naxis = header.get("NAXIS", 0)
    if naxis == 0:
        return
    size = abs(header.get("BITPIX", 8)) // 8
    for i in range(1, naxis + 1):
        size *= header.get(f"NAXIS{i}", 0)
    size += header.get("PCOUNT", 0) * abs(header.get("BITPIX", 8)) // 8
    f.seek((size + BLOCK - 1) // BLOCK * BLOCK, 1)


def _parse_tform(tform: str) -> tuple[str, str, int]:
    """'12A' → ('A', 'S12', 12); 'D' → ('D', '>f8', 8)."""
    i = 0
    while i < len(tform) and tform[i].isdigit():
        i += 1
    rep = int(tform[:i]) if i else 1
    letter = tform[i]
    if letter == "A":
        return "A", f"S{rep}", rep
    if letter not in _TFORM or rep != 1:
        raise ValueError(f"unsupported TFORM {tform!r}")
    dt, nbytes = _TFORM[letter]
    return letter, dt, nbytes


def read_bintable(path: str) -> pd.DataFrame:
    """First BINTABLE extension → pandas DataFrame (strings decoded and
    right-stripped per the standard's space padding; logicals → bool)."""
    with open(path, "rb") as f:
        primary = _read_header(f)
        if not primary.get("SIMPLE", False):
            raise ValueError("not a FITS file")
        _skip_data(f, primary)
        while True:
            hdr = _read_header(f)
            if hdr.get("XTENSION", "").startswith("BINTABLE"):
                break
            _skip_data(f, hdr)
        nrows = hdr["NAXIS2"]
        rowbytes = hdr["NAXIS1"]
        nfields = hdr["TFIELDS"]
        names, dtypes, letters = [], [], []
        total = 0
        for i in range(1, nfields + 1):
            name = hdr.get(f"TTYPE{i}", f"col{i}")
            letter, dt, nbytes = _parse_tform(hdr[f"TFORM{i}"])
            names.append(name)
            dtypes.append((name, dt))
            letters.append(letter)
            total += nbytes
        if total != rowbytes:
            raise ValueError(
                f"TFORM widths sum to {total}, NAXIS1 is {rowbytes}"
            )
        data = f.read(nrows * rowbytes)
    arr = np.frombuffer(data, dtype=np.dtype(dtypes), count=nrows)
    out = {}
    for name, letter in zip(names, letters):
        col = arr[name]
        if letter == "A":
            out[name] = [s.decode("ascii").rstrip() for s in col]
        elif letter == "L":
            out[name] = col == ord("T")
        else:
            # native byte order for pandas
            out[name] = col.astype(col.dtype.newbyteorder("="))
    return pd.DataFrame(out)


_BITPIX = {8: "u1", 16: ">i2", 32: ">i4", 64: ">i8", -32: ">f4", -64: ">f8"}


def read_image(data: bytes) -> np.ndarray:
    """Primary IMAGE HDU from in-memory FITS bytes → 2-D numpy array —
    the cutout-stamp decode (reference: gzipped 63×63 float32 stamps in
    cutoutScience.stampData, read via astropy at
    ztf/hostless_detection/pipeline_utils.py:46-57). BSCALE/BZERO are
    applied when present; dtype follows BITPIX."""
    import io as _io

    buf = _io.BytesIO(data)
    hdr = _read_header(buf)  # consumes exactly the header blocks
    if not hdr.get("SIMPLE", False):
        raise ValueError("not a FITS image")
    if hdr.get("NAXIS") != 2:
        raise ValueError(f"expected NAXIS=2 image, got {hdr.get('NAXIS')}")
    w, h = hdr["NAXIS1"], hdr["NAXIS2"]
    dt = np.dtype(_BITPIX[hdr["BITPIX"]])
    arr = np.frombuffer(
        data, dtype=dt, count=w * h, offset=buf.tell()
    ).reshape(h, w)
    scale, zero = hdr.get("BSCALE", 1), hdr.get("BZERO", 0)
    if scale != 1 or zero != 0:
        arr = arr * float(scale) + float(zero)
    return arr


def _card(key: str, value, comment: str = "") -> bytes:
    if isinstance(value, bool):
        v = "T" if value else "F"
        s = f"{key:<8}= {v:>20}"
    elif isinstance(value, int):
        s = f"{key:<8}= {value:>20}"
    elif isinstance(value, str):
        s = f"{key:<8}= '{value:<8}'"
    else:
        raise TypeError(type(value))
    if comment:
        s += f" / {comment}"
    return s.ljust(CARD).encode("ascii")[:CARD]


def _pad(b: bytes, fill: bytes = b"\x00") -> bytes:
    rem = len(b) % BLOCK
    return b if rem == 0 else b + fill * (BLOCK - rem)


def write_bintable(path: str, pdf: pd.DataFrame) -> None:
    """pandas DataFrame → minimal FITS: empty primary HDU + one BINTABLE
    extension. Column types map back onto the supported TFORM subset;
    object/string columns become fixed-width ``rA`` at the max length."""
    fields = []
    cols = []
    for name in pdf.columns:
        s = pdf[name]
        if s.dtype == np.dtype("bool"):
            fields.append((name, "1L", 1))
            cols.append(np.where(s.to_numpy(), ord("T"), ord("F")).astype("u1"))
        elif np.issubdtype(s.dtype, np.floating):
            w = 4 if s.dtype == np.float32 else 8
            fields.append((name, "1E" if w == 4 else "1D", w))
            cols.append(s.to_numpy().astype(f">f{w}"))
        elif np.issubdtype(s.dtype, np.integer):
            w = s.dtype.itemsize if s.dtype.itemsize in (2, 4, 8) else 8
            fields.append((name, {2: "1I", 4: "1J", 8: "1K"}[w], w))
            cols.append(s.to_numpy().astype(f">i{w}"))
        else:
            strs = ["" if v is None else str(v) for v in s]
            w = max(1, max((len(x) for x in strs), default=1))
            fields.append((name, f"{w}A", w))
            cols.append(
                np.array([x.ljust(w)[:w].encode("ascii") for x in strs],
                         dtype=f"S{w}")
            )
    rowbytes = sum(w for _n, _t, w in fields)
    nrows = len(pdf)
    dtypes = np.dtype(
        [(n, c.dtype) for (n, _t, _w), c in zip(fields, cols)]
    )
    table = np.empty(nrows, dtype=dtypes)
    for (n, _t, _w), c in zip(fields, cols):
        table[n] = c

    with open(path, "wb") as f:
        primary = (
            _card("SIMPLE", True, "conforms to FITS standard")
            + _card("BITPIX", 8)
            + _card("NAXIS", 0)
            + _card("EXTEND", True)
            + b"END".ljust(CARD)
        )
        f.write(_pad(primary, b" "))
        ext = (
            _card("XTENSION", "BINTABLE", "binary table extension")
            + _card("BITPIX", 8)
            + _card("NAXIS", 2)
            + _card("NAXIS1", rowbytes, "bytes per row")
            + _card("NAXIS2", nrows, "rows")
            + _card("PCOUNT", 0)
            + _card("GCOUNT", 1)
            + _card("TFIELDS", len(fields))
        )
        for i, (n, t, _w) in enumerate(fields, 1):
            ext += _card(f"TTYPE{i}", n) + _card(f"TFORM{i}", t)
        ext += b"END".ljust(CARD)
        f.write(_pad(ext, b" "))
        f.write(_pad(table.tobytes()))
