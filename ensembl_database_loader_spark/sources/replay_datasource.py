"""Spark 4 Python STREAMING DataSource: deterministic offset-based
replay of a parquet event log — the streaming twin of
``dump_datasource`` and the test/backfill seam every streaming
pipeline wants: replay a bounded historical log through the SAME
streaming query that will later run live, with exact, reproducible
micro-batch boundaries (offset = row position in ``id_col`` order, so
batch N contains rows [N*batch_rows, (N+1)*batch_rows) EVERY run).

Built on ``SimpleDataSourceStreamReader`` — the driver-side variant of
the streaming source API (right for bounded replay and low-throughput
sources; a partitioned ``DataSourceStreamReader`` is the
high-throughput shape). Offsets are ``{"row": n}`` dicts; a replayed
range re-reads identically (``readBetweenOffsets``), which is exactly
the contract the checkpoint recovery path exercises.

Usage::

    spark.dataSource.register(EventReplayDataSource)
    (spark.readStream.format("event_replay")
        .option("path", ".../events.parquet")
        .option("batch_rows", 500)
        .load())

With ``Trigger.AvailableNow`` the stream drains the log and stops
(an exhausted offset yields an empty batch at the same position).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

_PA_MAP = {
    "int64": LongType(),
    "int32": LongType(),
    "double": DoubleType(),
    "float": DoubleType(),
    "string": StringType(),
    "large_string": StringType(),
}


def _spark_schema(pa_schema) -> StructType:
    fields = []
    for f in pa_schema:
        t = str(f.type)
        if t.startswith("timestamp"):
            st = TimestampType()
        else:
            st = _PA_MAP.get(t, StringType())
        fields.append(StructField(f.name, st, True))
    return StructType(fields)


class _ReplayReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self._path = options["path"]
        self._batch = int(options.get("batch_rows", 1000))
        self._id_col = options.get("id_col", "event_id")
        if self._batch < 1:
            raise ValueError(f"batch_rows must be >= 1, got {self._batch}")
        self._table = None  # lazy; the reader object is pickled around

    def _load(self):
        if self._table is None:
            import pyarrow.parquet as pq

            t = pq.read_table(self._path)
            idx = t.schema.get_field_index(self._id_col)
            if idx < 0:
                raise KeyError(f"id_col {self._id_col!r} not in {t.schema.names}")
            import pyarrow.compute as pc

            self._table = t.take(pc.sort_indices(t[self._id_col]))
        return self._table

    def initialOffset(self):
        return {"row": 0}

    def __getstate__(self):
        # the reader is pickled into the streaming plan; the cached
        # arrow table must not travel (reload lazily on the other side)
        d = dict(self.__dict__)
        d["_table"] = None
        return d

    def _rows(self, start: int, end: int) -> list:
        t = self._load()
        s = t.slice(start, max(end - start, 0))
        # columnar conversion: per-column to_pylist + zip produces the
        # same tuples as row-wise to_pylist dicts (identical Arrow
        # scalar conversion) without building one dict per row —
        # measurably faster on 100k-row micro-batches
        return list(zip(*(col.to_pylist() for col in s.columns)))

    def read(self, start: dict):
        # a list_iterator, NOT a generator: Spark's prefetch cache
        # copy.copy()s the returned iterator when a later batch reuses
        # it, and generators are neither copyable nor picklable
        t = self._load()
        s = int(start["row"])
        e = min(s + self._batch, t.num_rows)
        if e <= s:
            return iter(()), start  # drained: empty batch, same offset
        return iter(self._rows(s, e)), {"row": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        # checkpoint-recovery replay: MUST equal the original batch
        return iter(self._rows(int(start["row"]), int(end["row"])))


class EventReplayDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "event_replay"

    def schema(self):
        if "path" not in self.options:
            raise ValueError("event_replay needs .option('path', <parquet>)")
        import pyarrow.parquet as pq

        return _spark_schema(pq.read_schema(self.options["path"]))

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _ReplayReader(dict(self.options))
