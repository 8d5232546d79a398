"""Pure-Python Spark DataSource: the alert-archive replay source.

The reference ingests alert archives through external source modules the
container lacks (Avro reader + Kafka stream, tester.py:89-105 /
SURVEY §2.1). Spark 4's Python DataSource API
(``pyspark.sql.datasource``) closes that architectural gap without JVM
jars: this module implements ``alert_replay``, a source that exposes any
local parquet alert table as

- a **batch** source with real partition planning (one ``InputPartition``
  per parquet row group → parallel scans), column projection via the
  ``columns`` option, and best-effort **filter pushdown**
  (``pushFilters`` receives Catalyst predicates; row groups whose
  min/max statistics cannot satisfy them are pruned — the same contract
  as the native parquet reader: pruning is approximate, Spark re-applies
  the filters exactly, so correctness never depends on the stats); and
- a **streaming** source that replays the table as deterministic
  row-offset micro-batches — the Kafka-replay harness every streaming
  pipeline needs in tests: offsets are plain row positions, reads are
  row-group-aligned partition slices, and a replayed run is
  bit-identical to the batch read. ``advance_per_trigger`` opts into
  chunked admission control (see :class:`AlertReplayStreamReader` for
  the availableNow caveat that makes it opt-in).

Arrow end to end: ``read`` yields ``pyarrow.RecordBatch`` objects, so
rows never pass through Python object conversion.

At 100 TB the same class shape points at an object store listing instead
of one file and row groups become file splits; the offsets/partitions
contract is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)


@dataclass
class _RowGroupPartition(InputPartition):
    row_group: int


@dataclass
class _RowSlicePartition(InputPartition):
    start: int
    end: int


def _projected(schema_names, columns_opt):
    if not columns_opt:
        return list(schema_names)
    cols = [c.strip() for c in columns_opt.split(",") if c.strip()]
    missing = [c for c in cols if c not in schema_names]
    if missing:
        raise ValueError(f"alert_replay: unknown columns {missing}")
    return cols


class AlertReplaySource(DataSource):
    """``spark.read.format("alert_replay").option("path", …)`` — see
    module docstring. Options: ``path`` (parquet file, required),
    ``columns`` (comma-separated projection, optional),
    ``rows_per_batch`` (streaming chunk size, default 2000)."""

    @classmethod
    def name(cls) -> str:
        return "alert_replay"

    def schema(self):
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import from_arrow_schema

        path = self.options.get("path")
        if not path:
            raise ValueError("alert_replay: 'path' option is required")
        arrow = pq.read_schema(path)
        cols = _projected(arrow.names, self.options.get("columns"))
        fields = [arrow.field(c) for c in cols]
        import pyarrow as pa

        return from_arrow_schema(pa.schema(fields))

    def reader(self, schema) -> "AlertReplayReader":
        return AlertReplayReader(self.options)

    def streamReader(self, schema) -> "AlertReplayStreamReader":
        return AlertReplayStreamReader(self.options)


# min/max row-group pruning: a filter class → "can rows in [lo, hi]
# satisfy it?" (None stats → must keep the group)
def _group_may_match(flt: Filter, lo, hi) -> bool:
    if lo is None or hi is None:
        return True
    v = flt.value
    if isinstance(flt, EqualTo):
        return lo <= v <= hi
    if isinstance(flt, GreaterThan):
        return hi > v
    if isinstance(flt, GreaterThanOrEqual):
        return hi >= v
    if isinstance(flt, LessThan):
        return lo < v
    if isinstance(flt, LessThanOrEqual):
        return lo <= v
    return True


_PRUNABLE = (EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual)


class AlertReplayReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        self.columns = options.get("columns")
        self.filters: list[Filter] = []

    def pushFilters(self, filters):
        """Record single-column comparison predicates for row-group
        pruning; return EVERY filter as unsupported so Spark re-applies
        them exactly (stats pruning is best-effort, like parquet)."""
        self.filters = [
            f
            for f in filters
            if isinstance(f, _PRUNABLE) and len(f.attribute) == 1
        ]
        return filters

    def planned_row_groups(self) -> list[int]:
        """Row groups surviving min/max pruning (driver side; also unit-
        testable without a session)."""
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        sch = f.schema_arrow.names
        keep = []
        for rg in range(f.metadata.num_row_groups):
            meta = f.metadata.row_group(rg)
            ok = True
            for flt in self.filters:
                col = flt.attribute[0]
                if col not in sch:
                    continue
                stats = meta.column(sch.index(col)).statistics
                if stats is None or not stats.has_min_max:
                    continue
                if not _group_may_match(flt, stats.min, stats.max):
                    ok = False
                    break
            if ok:
                keep.append(rg)
        return keep

    def partitions(self):
        return [_RowGroupPartition(rg) for rg in self.planned_row_groups()]

    def read(self, partition: _RowGroupPartition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        cols = _projected(f.schema_arrow.names, self.columns)
        yield from f.read_row_group(
            partition.row_group, columns=cols
        ).to_batches()


class AlertReplayStreamReader(DataSourceStreamReader):
    """Offsets are plain row positions. Two replay modes:

    - default: ``latestOffset`` → table end. One micro-batch per run
      (the engine's availableNow handling for Python sources falls back
      to single-batch — an admission-controlled offset there would
      silently truncate the replay), but the batch still reads in
      parallel ``rows_per_batch``-sized partitions.
    - ``advance_per_trigger`` > 0: each trigger advances the offset by
      at most that many rows — the chunked Kafka-replay harness. Use
      with a processingTime trigger and stop when caught up (the
      engine's availableNow fallback would stop after one chunk).
    """

    def __init__(self, options):
        self.path = options.get("path")
        self.columns = options.get("columns")
        self.rows_per_batch = int(options.get("rows_per_batch", "2000"))
        self.advance_per_trigger = int(options.get("advance_per_trigger", "0"))
        self._total: int | None = None
        self._target = 0  # last offset handed to the engine

    def _num_rows(self) -> int:
        if self._total is None:
            import pyarrow.parquet as pq

            self._total = pq.read_metadata(self.path).num_rows
        return self._total

    def initialOffset(self) -> dict:
        return {"row": 0}

    def latestOffset(self) -> dict:
        if self.advance_per_trigger > 0:
            self._target = min(
                self._num_rows(), self._target + self.advance_per_trigger
            )
        else:
            self._target = self._num_rows()
        return {"row": self._target}

    def partitions(self, start: dict, end: dict):
        # checkpoint-restart recovery: after a restart the engine replans
        # from the committed start, which a fresh _target (reset to 0 by
        # __init__) would otherwise regress below — latestOffset must stay
        # monotonic past the recovered offset or committed rows replay
        # (same fix as AvroReplayStreamReader.partitions)
        self._target = max(self._target, start["row"], end["row"])
        a, b = start["row"], end["row"]
        out = []
        step = self.rows_per_batch
        while a < b:
            out.append(_RowSlicePartition(a, min(a + step, b)))
            a += step
        return out

    def read(self, partition: _RowSlicePartition):
        import pyarrow.parquet as pq

        f = pq.ParquetFile(self.path)
        cols = _projected(f.schema_arrow.names, self.columns)
        # row-group-aligned slice: skip whole groups before the slice,
        # read only the groups overlapping [start, end)
        first = 0
        batches = []
        for rg in range(f.metadata.num_row_groups):
            n = f.metadata.row_group(rg).num_rows
            if first + n <= partition.start:
                first += n
                continue
            if first >= partition.end:
                break
            tbl = f.read_row_group(rg, columns=cols)
            lo = max(0, partition.start - first)
            hi = min(n, partition.end - first)
            batches.append(tbl.slice(lo, hi - lo))
            first += n
        for tbl in batches:
            yield from tbl.to_batches()

    def commit(self, end: dict) -> None:
        pass


def register_replay_source(spark) -> None:
    """Idempotent registration of the alert_replay format."""
    key = "fink_science_spark.replay_registered"
    try:
        if spark.conf.get(key, "no") == "yes":
            return
    except Exception:  # noqa: BLE001
        pass
    spark.dataSource.register(AlertReplaySource)
    spark.conf.set(key, "yes")
