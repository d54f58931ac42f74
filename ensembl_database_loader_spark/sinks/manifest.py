"""Manifest-committed parquet tables: atomic snapshot commits for the
plain-parquet lake.

The round-7 gap this closes: every incremental writer in the repo
(``merge_snapshot`` output, ``compact_parquet``'s two-rename swap,
streaming micro-batch appends) left a window where a racing reader saw
a half-written directory — the standard non-transactional parquet
trade-off. The fingerprint store already solved the read side with a
snapshot-isolated explicit file list (``pipeline/curate._snapshot_files``);
this module generalizes that into a tiny commit protocol:

- Writers write data files under ``<table>/data/<commit-uuid>/`` (a
  directory no reader ever lists), then atomically PUBLISH a manifest
  ``_manifest-<version>.json`` at the table root naming the exact data
  files of the new snapshot. A single-file rename is atomic on HDFS and
  POSIX local filesystems, so a manifest is either fully visible or not
  there at all — readers can never observe a partial commit.
- Readers resolve the LATEST manifest and read that explicit file list
  (``spark.read.parquet(*files)``). A plan built from one snapshot is
  pinned: later commits add new manifests and new data directories, but
  never touch the files an older manifest names, so a reader that
  resolved before a concurrent merge/compact still reads a consistent
  snapshot. Old files are reclaimed explicitly by ``vacuum_table``.
- Concurrent committers are serialized optimistically: each manifest
  carries a random writer id; after renaming into ``_manifest-<v>``,
  the committer reads the published file back and, if another writer's
  id is inside (local rename(2) silently replaces, so exists-checks
  alone can't detect the race), rebuilds against the new head and
  retries at ``v+1``. Underscore-prefixed names keep manifests and temp
  files invisible to any plain Spark directory scan of the table root.

The manifest also carries ``txn`` — a ``{app_id: last_batch_id}``
watermark map — which upgrades streaming ``foreachBatch`` appends from
at-least-once to exactly-once: a replayed micro-batch (same app, same
batch id <= the stored watermark) commits nothing (the idiom JDBC/Delta
sinks use for idempotent replay).

Reference analogue: the loader's coarse transactionality — drop/create
with a collision guard around every database load
(``LoadFiles.pm:56-64``, ``Database.pm:56-63``) — made incremental:
instead of "the whole database is either the old or the new load", the
unit is a snapshot version.

Scale notes: a manifest is O(files) JSON — at 100 TB keep file counts
sane with ``compact_table`` (which is itself just another commit). The
commit path is pure driver-side filesystem metadata (no Spark job), so
commit latency is independent of data size. Readers pay one small-file
read to resolve; listing cost is O(manifests), bounded by vacuum.
"""

from __future__ import annotations

import base64
import json
import math
import os
import re
import urllib.parse
import uuid
from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

_MANIFEST_RE = re.compile(r"^_manifest-(\d{12})\.json$")
_DIGITS = 12
_MAX_COMMIT_RETRIES = 20


# ---------------------------------------------------------------------------
# Hadoop FS helpers (driver-side metadata only — no Spark jobs)
# ---------------------------------------------------------------------------


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def _local_path(path: str) -> str | None:
    """POSIX path when ``path`` names the LOCAL filesystem (bare
    absolute paths and ``file:`` URIs), else None.

    Driver-side metadata ops (manifest JSON — which carries per-file
    bloom bitmaps and can reach megabytes — directory listings, the
    commit rename) go through py4j + Hadoop streams otherwise; measured
    on the lifecycle probes that is ~0.3-0.5 s PER manifest read and
    over half the probes' wall time. Remote schemes (hdfs://, s3a://)
    keep the Hadoop FS path unchanged."""
    if path.startswith("/"):
        return path
    if path.startswith("file:"):
        rest = path[5:]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest if rest.startswith("/") else "/" + rest
    return None


def _read_bytes(spark: SparkSession, path: str) -> bytes:
    lp = _local_path(path)
    if lp is not None:
        with open(lp, "rb") as fh:
            return fh.read()
    fs, hpath, jvm = _fs(spark, path)
    stream = fs.open(hpath)
    baos = jvm.java.io.ByteArrayOutputStream()
    # closes both streams; works on any Hadoop FS scheme
    jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, baos, 4096, True)
    return bytes(baos.toByteArray())


def _write_bytes(spark: SparkSession, path: str, data: bytes) -> None:
    lp = _local_path(path)
    if lp is not None:
        # fs.create makes parent dirs; match that
        os.makedirs(os.path.dirname(lp) or "/", exist_ok=True)
        with open(lp, "wb") as fh:
            fh.write(data)
        return
    fs, hpath, _ = _fs(spark, path)
    out = fs.create(hpath, True)
    out.write(bytearray(data))
    out.close()


def _list_names(spark: SparkSession, path: str) -> list[str]:
    lp = _local_path(path)
    if lp is not None:
        try:
            return os.listdir(lp)
        except (FileNotFoundError, NotADirectoryError):
            return []
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return []
    return [st.getPath().getName() for st in fs.listStatus(hpath)]


def _list_data_files(spark: SparkSession, data_dir: str) -> list[str]:
    """Data-file names under one commit's data directory (no _/. files)."""
    return [
        n
        for n in _list_names(spark, data_dir)
        if not n.startswith(("_", "."))
    ]


def _list_data_files_recursive(spark: SparkSession, data_dir: str) -> list[str]:
    """Relative data-file paths under one commit's data directory,
    descending through hive ``col=value`` partition directories."""
    lp = _local_path(data_dir)
    if lp is not None:
        found: list[str] = []
        base = lp.rstrip("/")
        for cur, dirs, files in os.walk(base):
            rel_dir = cur[len(base):].lstrip("/")
            # same exemption Spark's own path filter applies: a hive
            # partition directory for an underscore-named column
            # (``_cell=3``) is data, not a hidden directory
            dirs[:] = [
                d for d in dirs if not d.startswith(("_", ".")) or "=" in d
            ]
            for n in files:
                if n.startswith(("_", ".")) and "=" not in n:
                    continue
                found.append(f"{rel_dir}/{n}" if rel_dir else n)
        return found
    fs, hroot, jvm = _fs(spark, data_dir)
    out: list[str] = []

    def walk(hpath, prefix: str) -> None:
        for st in fs.listStatus(hpath):
            name = st.getPath().getName()
            # same exemption Spark's own path filter applies: a hive
            # partition directory for an underscore-named column
            # (``_cell=3``) is data, not a hidden file
            if name.startswith(("_", ".")) and "=" not in name:
                continue
            rel = f"{prefix}{name}"
            if st.isDirectory():
                walk(st.getPath(), f"{rel}/")
            else:
                out.append(rel)

    walk(hroot, "")
    return out


#: Spark's hive-layout sentinel for a null partition value
_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _total_size(spark: SparkSession, root: str, rels: list[str]) -> int:
    """Sum of the files' on-disk bytes (driver-side metadata)."""
    lp = _local_path(root)
    if lp is not None:
        return sum(os.path.getsize(f"{lp}/{rel}") for rel in rels)
    fs, _, jvm = _fs(spark, root)
    return sum(
        fs.getFileStatus(jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}")).getLen()
        for rel in rels
    )


def _partition_values(rel: str, partition_by: tuple[str, ...]) -> dict:
    """{col: raw string or None} parsed from a staged file's hive path
    segments (``data/<uuid>/p=3/q=x%20y/part-...``). Values are stored
    as the URL-unescaped strings Spark wrote; typing happens at prune
    time against the table schema."""
    vals: dict[str, str | None] = {}
    for seg in rel.split("/")[:-1]:
        if "=" not in seg:
            continue
        k, _, v = seg.partition("=")
        if k in partition_by:
            vals[k] = None if v == _HIVE_NULL else urllib.parse.unquote(v)
    return vals


def _typed_part(raw: str | None, dtype: str):
    """A partition value string cast to the column's family so it
    compares correctly in ``files_matching`` (int family -> int, float
    family -> float, everything else stays a string — dates/timestamps
    compare lexicographically in their hive form, same as file stats).
    A value that doesn't parse returns the raw string (conservative:
    the same_family check then keeps the file for numeric probes)."""
    if raw is None:
        return None
    try:
        if dtype in _STATS_NUMERIC:
            return float(raw) if dtype in ("float", "double") else int(raw)
    except ValueError:
        return raw
    return raw


# ---------------------------------------------------------------------------
# Manifest resolution
# ---------------------------------------------------------------------------


def list_manifests(spark: SparkSession, path: str) -> list[int]:
    """Sorted versions of every published manifest at the table root."""
    out = []
    for n in _list_names(spark, path):
        m = _MANIFEST_RE.match(n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def _manifest_path(path: str, version: int) -> str:
    return f"{path.rstrip('/')}/_manifest-{version:0{_DIGITS}d}.json"


def read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    return json.loads(_read_bytes(spark, _manifest_path(path, version)))


def latest_manifest(spark: SparkSession, path: str) -> dict | None:
    """The head manifest, or None for a not-yet-committed table."""
    versions = list_manifests(spark, path)
    if not versions:
        return None
    return read_manifest(spark, path, versions[-1])


# ---------------------------------------------------------------------------
# Commit protocol
# ---------------------------------------------------------------------------


def _commit(
    spark: SparkSession,
    path: str,
    build: Callable[[dict | None], dict | None],
    operation: str,
) -> dict | None:
    """Optimistic-concurrency commit loop.

    ``build(parent_manifest_or_None)`` returns the new manifest's
    payload fields (``files``, ``schema``, optional ``txn`` map) — or
    None to skip the commit (idempotent replay). It is re-invoked
    against the NEW head whenever a race is lost, so its output must be
    a pure function of the parent (plus the writer's own staged files).

    Returns the published manifest dict, or None if ``build`` skipped.
    """
    root = path.rstrip("/")
    lp = _local_path(root)
    if lp is not None:
        os.makedirs(lp, exist_ok=True)
    else:
        fs, hroot, jvm = _fs(spark, root)
        fs.mkdirs(hroot)

    def _publish(tmp: str, final: str) -> bool:
        """Atomic rename, Hadoop local-rename semantics (rename(2)
        REPLACES an existing destination — the read-back below is what
        detects a lost race on both paths)."""
        if lp is not None:
            ltmp, lfinal = _local_path(tmp), _local_path(final)
            if os.path.exists(lfinal):
                os.remove(ltmp)
                return False
            try:
                os.rename(ltmp, lfinal)
            except OSError:
                os.remove(ltmp)
                return False
            return True
        ffinal = jvm.org.apache.hadoop.fs.Path(final)
        if fs.exists(ffinal):
            # fast-path conflict: someone already published this version
            fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), False)
            return False
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), ffinal):
            fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), False)
            return False
        return True

    for _ in range(_MAX_COMMIT_RETRIES):
        versions = list_manifests(spark, root)
        head = read_manifest(spark, root, versions[-1]) if versions else None
        payload = build(head)
        if payload is None:
            return None
        version = (versions[-1] + 1) if versions else 0
        writer = uuid.uuid4().hex
        manifest = {
            "version": version,
            "writer": writer,
            "operation": operation,
            "parent": versions[-1] if versions else None,
            **payload,
        }
        tmp = f"{root}/_tmp-manifest-{writer}.json"
        final = _manifest_path(root, version)
        _write_bytes(spark, tmp, json.dumps(manifest).encode())
        if not _publish(tmp, final):
            continue
        # local rename(2) REPLACES an existing destination, so the
        # exists-check above is not airtight — read the published file
        # back and confirm it is ours (rename is atomic, so this read
        # sees exactly one writer's complete manifest)
        published = read_manifest(spark, root, version)
        if published.get("writer") == writer:
            return manifest
        # lost the race: the competing manifest is the new head; retry
    raise RuntimeError(
        f"manifest commit at {path} lost {_MAX_COMMIT_RETRIES} races — "
        "pathological contention or a stuck competing writer"
    )


def _stage_data(
    df: DataFrame, path: str, partition_by: tuple[str, ...] = ()
) -> tuple[list[str], str]:
    """Write ``df``'s data files under a fresh ``data/<uuid>/`` commit
    directory nobody reads directly; returns (relative file paths,
    schema json). The ONLY Spark job in the write path. With
    ``partition_by`` the files land in hive ``col=value`` directories
    (partition columns live in the PATH, not the files — readers
    reconstruct them via ``basePath``)."""
    root = path.rstrip("/")
    commit_dir = f"data/{uuid.uuid4().hex}"
    if partition_by:
        df.write.partitionBy(*partition_by).parquet(f"{root}/{commit_dir}")
        rel = [
            f"{commit_dir}/{n}"
            for n in sorted(
                _list_data_files_recursive(
                    df.sparkSession, f"{root}/{commit_dir}"
                )
            )
        ]
    else:
        df.write.parquet(f"{root}/{commit_dir}")
        rel = [
            f"{commit_dir}/{n}"
            for n in sorted(
                _list_data_files(df.sparkSession, f"{root}/{commit_dir}")
            )
        ]
    return rel, df.schema.json()


def _remove_staged(spark: SparkSession, root: str, staged: list[str]) -> None:
    """Best-effort removal of just-staged data files (a zero-hit
    rewrite's speculative output). Losing the race to remove one is
    harmless — unreferenced files under data/ are invisible to readers
    and reclaimed by ``vacuum_table``."""
    if not staged:
        return
    lp = _local_path(root)
    dirs: set[str] = set()
    for rel in staged:
        dirs.add(rel.rsplit("/", 1)[0])
        if lp is not None:
            try:
                os.remove(f"{lp}/{rel}")
            except OSError:
                pass
        else:
            fs, _, jvm = _fs(spark, root)
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}"), False)
    if lp is not None:
        for d in sorted(dirs, key=len, reverse=True):
            try:
                os.rmdir(f"{lp}/{d}")
            except OSError:
                pass


def _read_files(
    spark: SparkSession, m: dict, root: str, rels: list[str]
) -> DataFrame:
    """Read manifest-listed data files with the table's declared schema
    and column ORDER. For a partitioned table the partition columns
    (which live in the hive PATHS, not the files) are reconstructed by
    whichever strategy yields the fewer scan branches:

    - per PARTITION VALUE: every file of one partition tuple reads in
      one plain multi-file scan (no basePath needed — the values are
      constant within the group) and the partition columns attach as
      typed LITERALS from the manifest's ``parts`` map. Branch count is
      bounded by the partitions touched — a streaming-fed table that
      accumulated one commit per micro-batch still plans O(partitions),
      not O(commits).
    - per COMMIT DIRECTORY: hive reconstruction with that commit's
      ``basePath`` (one basePath can only serve one directory tree).
      Fewer branches when one backfill commit wrote many partitions,
      and the fallback for manifests predating the ``parts`` map.
    """
    schema = StructType.fromJson(json.loads(m["schema"]))
    if not rels:
        return spark.createDataFrame([], schema)
    pb = tuple(m.get("partition_by") or ())
    if not pb:
        return spark.read.schema(schema).parquet(
            *[f"{root}/{rel}" for rel in rels]
        )
    by_commit: dict[str, list[str]] = {}
    for rel in rels:
        parts = rel.split("/")
        by_commit.setdefault("/".join(parts[:2]), []).append(rel)
    parts_map = m.get("parts", {})
    by_value: dict[tuple, list[str]] = {}
    complete = True
    for rel in rels:
        v = parts_map.get(rel)
        if v is None or set(v) != set(pb):
            complete = False
            break
        by_value.setdefault(tuple(sorted(v.items())), []).append(rel)
    if complete and len(by_value) < len(by_commit):
        data_fields = [f for f in schema.fields if f.name not in set(pb)]
        data_schema = StructType(data_fields)
        types = {f.name: f.dataType for f in schema.fields if f.name in set(pb)}
        out: DataFrame | None = None
        for key in sorted(by_value, key=str):
            vals = dict(key)
            df = spark.read.schema(data_schema).parquet(
                *[f"{root}/{rel}" for rel in by_value[key]]
            )
            for c in pb:
                df = df.withColumn(c, F.lit(vals[c]).cast(types[c]))
            out_df = df.select(*[f.name for f in schema.fields])
            out = out_df if out is None else out.unionByName(out_df)
        assert out is not None
        return out
    out = None
    for commit_dir, group in sorted(by_commit.items()):
        df = (
            spark.read.schema(schema)
            .option("basePath", f"{root}/{commit_dir}")
            .parquet(*[f"{root}/{rel}" for rel in group])
            .select(*[f.name for f in schema.fields])
        )
        out = df if out is None else out.unionByName(df)
    assert out is not None
    return out


#: dtypes we collect file stats for (numeric kept as JSON numbers,
#: date/timestamp rendered as sortable strings; anything else — maps,
#: arrays, decimals (whose float rounding could mis-prune a boundary
#: file), binaries — is skipped and its files are simply never pruned).
_STATS_NUMERIC = {"byte", "short", "int", "integer", "bigint", "long", "float", "double"}
_STATS_STRINGY = {"string", "date", "timestamp", "timestamp_ntz"}


#: dtypes per-file bloom filters accept: exact-typed equality probes
#: only make sense on discrete key-like columns (the query literal is
#: cast to the column's exact type so the hash matches the collection
#: pass bit-for-bit; float equality is excluded — an equality probe on
#: a float column is almost always a bug, not a lookup).
_BLOOM_TYPES = {"byte", "short", "int", "integer", "bigint", "long", "string", "date"}


#: stats dtypes whose parquet footer min/max is BYTE-IDENTICAL to the
#: engine aggregate: integrals (plain int32/int64 physical values) and
#: dates (int32 days, rendered to the same 'yyyy-MM-dd' form). Strings
#: (UTF-8 vs UTF-16 ordering) and floats (NaN/-0.0 footer semantics)
#: deliberately excluded — they keep the engine job.
_FOOTER_STATS_TYPES = {"byte", "short", "int", "integer", "bigint", "long", "date"}


def _footer_stats(
    lp: str,
    staged: list[str],
    usable: list[str],
    fields: dict[str, str],
) -> tuple[dict, dict, dict] | None:
    """Driver-side ({rel: {col: [min, max]}}, {rel: n_rows}, {}) from
    the staged files' parquet footers, or None when any usable column's
    type or any file's footer is not trustworthy enough to substitute
    for the engine aggregate (caller falls back to the scan job)."""
    if any(fields[c] not in _FOOTER_STATS_TYPES for c in usable):
        return None
    import pyarrow.parquet as pq

    out: dict[str, dict[str, list]] = {}
    counts: dict[str, int] = {}
    for rel in staged:
        md = pq.ParquetFile(f"{lp}/{rel}").metadata
        counts[rel] = int(md.num_rows)
        if not usable:
            continue
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        if any(c not in idx for c in usable):
            return None
        mins: dict[str, object] = {}
        maxs: dict[str, object] = {}
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in usable:
                col = rg.column(idx[c])
                n_vals = int(col.num_values)
                st = col.statistics
                if st is None or st.null_count is None:
                    return None
                if int(st.null_count) == n_vals:
                    continue  # all-null chunk contributes no bound
                if not st.has_min_max:
                    return None  # non-null values but no bounds: bail
                mn, mx = st.min, st.max
                if mn is None or mx is None:
                    return None
                if c not in mins or mn < mins[c]:  # type: ignore[operator]
                    mins[c] = mn
                if c not in maxs or mx > maxs[c]:  # type: ignore[operator]
                    maxs[c] = mx
        out[rel] = {
            c: [
                _json_stat(mins.get(c)),
                _json_stat(maxs.get(c)),
            ]
            for c in usable
        }
    return out, counts, {}


def _collect_stats(
    spark: SparkSession,
    root: str,
    staged: list[str],
    schema: StructType,
    stats_cols: tuple[str, ...],
    bloom_spec: dict[str, dict] | None = None,
) -> tuple[dict[str, dict[str, list]], dict[str, int], dict[str, dict[str, str]]]:
    """Per-file [min, max] for ``stats_cols``, per-file ROW COUNTS, and
    (when ``bloom_spec`` maps columns to {bits, hashes}) per-file BLOOM
    FILTERS, over the just-staged files: ONE column-pruned aggregate
    job (reads only the stat/bloom columns — with neither it scans zero
    data columns — grouped by input_file_name; never a per-file job).
    Bloom bit positions are ``pmod(xxhash64(col, seed_i), bits)`` —
    computed by the ENGINE, so the query side can reproduce them
    exactly with the same expression on a literal. The per-seed
    position sets are bounded by min(rows, bits), so the collected
    state is capped regardless of file size.
    Returns ({rel: {col: [min, max]}}, {rel: n_rows}, {rel: {col: b64}})."""
    bloom_spec = bloom_spec or {}
    fields = {f.name: f.dataType.simpleString() for f in schema.fields}
    unknown = [c for c in stats_cols if c not in fields]
    if unknown:
        raise ValueError(
            f"stats_cols {unknown!r} not in table schema {sorted(fields)!r}"
        )
    bad_bloom = [
        c for c in bloom_spec if c not in fields or fields[c] not in _BLOOM_TYPES
    ]
    if bad_bloom:
        raise ValueError(
            f"bloom_cols {bad_bloom!r} must be existing columns with a type in "
            f"{sorted(_BLOOM_TYPES)} (got schema {sorted(fields)!r})"
        )
    usable = [
        c
        for c in stats_cols
        if fields[c] in _STATS_NUMERIC or fields[c] in _STATS_STRINGY
    ]
    if not staged:
        return {}, {}, {}
    if not bloom_spec:
        # bloomless commit on a LOCAL table: the parquet FOOTERS already
        # carry per-file row counts and exact min/max for integral and
        # date columns — read them driver-side instead of paying a scan
        # job per commit (every write_table/apply_delta with plain id
        # stats, and every table of every streaming group commit, paid
        # that job). Strings and floats stay on the engine job: parquet
        # orders strings by UTF-8 bytes where the engine's min/max is
        # UTF-16 code-unit order, and float footers drop stats under
        # NaN / order -0.0 differently — a diverging bound could
        # mis-prune a file, so only byte-identical cases take the fast
        # path (_footer_stats returns None on anything untrustworthy).
        lp = _local_path(root)
        if lp is not None:
            fast = _footer_stats(lp, staged, usable, fields)
            if fast is not None:
                return fast
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in usable:
        mn, mx = F.min(F.col(c)), F.max(F.col(c))
        if fields[c] in _STATS_STRINGY and fields[c] != "string":
            # sortable full-precision string form; predicate values
            # must use the same 'yyyy-MM-dd HH:mm:ss[.SSSSSS]' shape
            fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS" if "timestamp" in fields[c] else "yyyy-MM-dd"
            mn, mx = F.date_format(mn, fmt), F.date_format(mx, fmt)
        aggs += [mn.alias(f"__mn_{c}"), mx.alias(f"__mx_{c}")]
    for c, meta in bloom_spec.items():
        bits, hashes = int(meta["bits"]), int(meta["hashes"])
        for i in range(hashes):
            aggs.append(
                F.collect_set(
                    F.when(
                        F.col(c).isNotNull(),
                        F.pmod(F.xxhash64(F.col(c), F.lit(i)), F.lit(bits)).cast(
                            "int"
                        ),
                    )
                ).alias(f"__bl{i}_{c}")
            )
    rows = (
        spark.read.schema(schema)
        .parquet(*[f"{root}/{rel}" for rel in staged])
        .groupBy(F.input_file_name().alias("__f"))
        .agg(*aggs)
        .collect()
    )
    # Match result rows back to staged rels by EXACT path suffix: tail
    # names alone are NOT unique in a partitioned stage (one task
    # writes the same part-NNNNN name into several hive dirs), and the
    # staged list may span SEVERAL commit dirs (apply_delta stages the
    # rewrite and the arrivals separately), so group candidates by tail
    # name and verify the full root-relative suffix. input_file_name
    # returns a URI (literal '%' re-encoded as '%25'), so one unquote
    # restores the on-disk literal path.
    by_tail: dict[str, list[str]] = {}
    for rel in staged:
        by_tail.setdefault(rel.rsplit("/", 1)[-1], []).append(rel)
    out: dict[str, dict[str, list]] = {}
    counts: dict[str, int] = {}
    blooms: dict[str, dict[str, str]] = {}
    for r in rows:
        p = urllib.parse.unquote(r["__f"].rstrip("/"))
        rel = next(
            (
                c
                for c in by_tail.get(p.rsplit("/", 1)[-1], [])
                if p.endswith("/" + c)
            ),
            None,
        )
        if rel is None:
            continue  # foreign file name — never prunable, just skip
        counts[rel] = int(r["__n"])
        if usable:
            out[rel] = {
                c: [_json_stat(r[f"__mn_{c}"]), _json_stat(r[f"__mx_{c}"])]
                for c in usable
            }
        if bloom_spec:
            blooms[rel] = {}
            for c, meta in bloom_spec.items():
                pos: set[int] = set()
                for i in range(int(meta["hashes"])):
                    pos.update(r[f"__bl{i}_{c}"] or [])
                blooms[rel][c] = _bloom_b64(pos, int(meta["bits"]))
    # files absent from the aggregate rows are EMPTY (Spark can write a
    # zero-row part file): record them as 0 so the metadata count is
    # complete, with all-null "no row can match" stats and an all-zero
    # bloom (no probe can hit an empty file)
    for rel in staged:
        if rel not in counts:
            counts[rel] = 0
            if usable:
                out[rel] = {c: [None, None] for c in usable}
            if bloom_spec:
                blooms[rel] = {
                    c: _bloom_b64(set(), int(meta["bits"]))
                    for c, meta in bloom_spec.items()
                }
    return out, counts, blooms


def _bloom_b64(positions: set[int], bits: int) -> str:
    """Pack set-bit positions into a base64 bitmap (``bits``/8 bytes
    before encoding; an all-null column yields the all-zero bitmap,
    which correctly prunes every equality probe)."""
    buf = bytearray(bits // 8)
    for p in positions:
        buf[p >> 3] |= 1 << (p & 7)
    return base64.b64encode(bytes(buf)).decode("ascii")


def _bloom_contains(b64: str, positions: list[int]) -> bool:
    """True unless some probe position's bit is unset (definite miss).

    A bitmap shorter than a probe position implies its sizing disagrees
    with ``bloom_meta`` (a corrupt/hand-edited manifest, or a commit
    race an older writer didn't guard) — degrade to "keep the file"
    rather than failing the scan or, worse, pruning on garbage."""
    buf = base64.b64decode(b64.encode("ascii"))
    return all(
        (p >> 3) >= len(buf) or buf[p >> 3] & (1 << (p & 7))
        for p in positions
    )


def _bloom_positions(
    spark: SparkSession, dtype: str, value, bits: int, hashes: int
):
    """The query-side twin of the collection pass: the same
    ``pmod(xxhash64(lit, seed_i), bits)`` expression the aggregate used,
    evaluated by the ENGINE on the literal cast to the column's EXACT
    type (xxhash64 hashes the physical type — an int32 and an int64 of
    the same value hash differently, so a Python-side reimplementation
    would silently prune wrong). One trivial 1-row local job; returns
    None (no pruning) when the literal doesn't cast (try_cast, so a
    malformed literal disables pruning instead of raising under ANSI —
    the row filter still reports it)."""
    ps = _bloom_positions_many(spark, dtype, [value], bits, hashes)
    return None if ps is None else ps[0]


#: Python types whose createDataFrame column type matches F.lit's
#: inference for the SAME value — the condition under which the
#: frame-shaped hash job below is expression-identical to the wide-row
#: form (both feed try_cast(dtype) the same pre-cast value).
_LIT_COL_TYPES = {bool: "boolean", int: "bigint", float: "double", str: "string"}


def _bloom_positions_many(
    spark: SparkSession, dtype: str, values: list, bits: int, hashes: int
):
    """``_bloom_positions`` for a literal LIST in one engine job.
    Returns one position list per value, or None when ANY literal
    fails to cast — pruning disables for the predicate, the row filter
    still applies.

    Shape, fastest first:

    - ZERO engine jobs for the common (python type, column dtype)
      pairs: a pure-Python XXH64 (functions/xxh64) replays the exact
      ``h = hash_typed(v, 42); h = hash_int(seed_i, h)`` chain the
      engine's ``xxhash64(col, lit(i))`` computes — bit-identity pinned
      by tests — so a point-lookup serve or a delete wave's bloom probe
      costs NO driver round trip at all.
    - one N-ROW literal frame projected through ONE set of
      ``pmod(xxhash64(try_cast(v), seed_i), bits)`` expressions — not a
      1-row, 5N-column projection, whose driver-side analysis/codegen
      grows superlinearly with the wave (measured ~1.1 s at 30 values
      and ~14 s at 290 values vs a flat ~0.4 s for the frame shape).
      The hash input is ``try_cast(<value>, dtype)`` evaluated BY THE
      ENGINE, so positions stay bit-identical to the collection pass.
    - values whose Python type createDataFrame would coerce differently
      than ``F.lit`` (None, Decimal, numpy scalars, mixed lists) fall
      back to the literal wide-row projection."""
    import datetime as _dt

    from ensembl_database_loader_spark.functions.xxh64 import (
        hash_int as _xx_int,
        hash_typed as _xx_typed,
    )

    # driver-side fast path: identical-typed values (the hot shapes —
    # victim-id ints/strings, query terms) hash in pure Python; any
    # value the module can't hash bit-identically punts the WHOLE list
    # to the engine paths below (positions must all come from one
    # definition or a mixed wave could prune inconsistently)
    py_out: list | None = []
    for v in values:
        h0 = _xx_typed(v, dtype, 42)
        if h0 is NotImplemented:
            py_out = None
            break
        ps = []
        for i in range(hashes):
            h = _xx_int(i, h0)
            if h >= 1 << 63:  # pmod over the SIGNED 64-bit value
                h -= 1 << 64
            ps.append(h % bits)
        py_out.append(ps)
    if py_out is not None:
        return py_out

    vtypes = {type(v) for v in values}
    ftype = (
        _LIT_COL_TYPES.get(next(iter(vtypes)))
        if len(vtypes) == 1
        else None
    )
    if ftype is None and vtypes == {_dt.date}:
        ftype = "date"
    if ftype == "bigint" and not all(-(2**63) <= v < 2**63 for v in values):
        ftype = None  # out of int64: let F.lit raise exactly as before
    if ftype is not None and values:
        from ensembl_database_loader_spark.functions.frames import (
            literal_frame,
        )

        lit = F.col("__v").try_cast(dtype)
        rows = literal_frame(
            spark,
            [(i, v) for i, v in enumerate(values)],
            f"__i int, __v {ftype}",
        ).select(
            "__i",
            lit.isNull().alias("__n"),
            *[
                F.pmod(F.xxhash64(lit, F.lit(i)), F.lit(bits))
                .cast("int")
                .alias(f"__p{i}")
                for i in range(hashes)
            ],
        ).collect()
        out = [None] * len(values)
        for r in rows:
            if r["__n"]:
                return None
            out[r["__i"]] = [r[f"__p{i}"] for i in range(hashes)]
        return out
    # fallback: 1-row wide projection (chunked at 500 values to bound
    # codegen width) for value types the frame path can't carry
    out = []
    for lo in range(0, len(values), 500):
        chunk = values[lo : lo + 500]
        cols = []
        for vi, v in enumerate(chunk):
            lit = F.lit(v).try_cast(dtype)
            cols.append(lit.isNull().alias(f"__n{vi}"))
            cols.extend(
                F.pmod(F.xxhash64(lit, F.lit(i)), F.lit(bits))
                .cast("int")
                .alias(f"__p{vi}_{i}")
                for i in range(hashes)
            )
        # single-partition range: the default carves defaultParallelism
        # empty tasks for this 1-row projection — 32 scheduler round
        # trips per chunk of pure overhead on every bloom probe
        row = spark.range(0, 1, 1, 1).select(*cols).first()
        for vi in range(len(chunk)):
            if row[f"__n{vi}"]:
                return None
            out.append([row[f"__p{vi}_{i}"] for i in range(hashes)])
    return out


def _json_stat(v):
    """Stat values must round-trip through JSON unchanged."""
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    return str(v)


#: default bloom sizing: 128 Kibit = 16 KiB/bitmap (~22 KiB base64 in
#: the manifest). With 4 hashes that holds ~18k distinct keys per file
#: at ~2% false-positive rate; size up via bloom_bits for bigger files.
_BLOOM_DEFAULT_BITS = 131072
_BLOOM_DEFAULT_HASHES = 4


def _bloom_effective_spec(
    head: dict | None,
    bloom_cols: tuple[str, ...],
    bits: int,
    hashes: int,
) -> dict[str, dict]:
    """The table's bloom column spec for a new commit: the head's
    ``bloom_meta`` (an append/rewrite must not silently drop the
    table's bloom capability) plus any newly requested columns. A
    column's (bits, hashes) are FIXED at introduction — every file's
    bitmap must stay probe-compatible — so re-passing a column with
    different sizing keeps the original."""
    if bits <= 0 or bits % 8:
        raise ValueError(f"bloom_bits must be a positive multiple of 8, got {bits}")
    if hashes <= 0:
        raise ValueError(f"bloom_hashes must be positive, got {hashes}")
    spec = dict((head or {}).get("bloom_meta", {}))
    for c in bloom_cols:
        spec.setdefault(c, {"bits": int(bits), "hashes": int(hashes)})
    return spec


_PRED_OPS = ("=", "<", "<=", ">", ">=", "in")


def _stat_comparable(v, mn) -> bool:
    """True when a predicate literal and a file stat are the same
    comparison family (numeric with numeric, string with string) —
    anything else means the stat cannot prove a miss."""
    return (
        isinstance(v, (int, float)) and not isinstance(v, bool)
        and isinstance(mn, (int, float)) and not isinstance(mn, bool)
    ) or (isinstance(v, str) and isinstance(mn, str))


def files_matching(manifest: dict, predicates) -> list[str]:
    """The manifest's file list, pruned by per-file [min, max] stats
    against ``predicates`` — a sequence of ``(col, op, value)`` with op
    in =, <, <=, >, >=. CONSERVATIVE by construction: a file is dropped
    only when its stats PROVE no row can satisfy every predicate; files
    without stats for a column (or with a stat/value type mismatch)
    are always kept. Callers still apply the predicate to the rows —
    pruning is an IO optimization, never the filter itself."""
    for col, op, v in predicates:
        if op not in _PRED_OPS:
            raise ValueError(f"unsupported predicate op {op!r} (use one of {_PRED_OPS})")
        if op == "in" and (not isinstance(v, (list, tuple, set)) or not v):
            raise ValueError(
                f"'in' predicate on {col!r} needs a non-empty list/tuple/set"
            )
    stats = manifest.get("stats", {})
    # partition values prune exactly like single-value stats: a file's
    # partition column has min == max == its hive path value
    parts = manifest.get("parts", {})
    part_types: dict[str, str] = {}
    if parts:
        part_types = {
            f.name: f.dataType.simpleString()
            for f in StructType.fromJson(json.loads(manifest["schema"])).fields
            if f.name in set(manifest.get("partition_by", ()))
        }
    out = []
    for rel in manifest["files"]:
        fstats = dict(stats.get(rel, {}))
        for c, raw in parts.get(rel, {}).items():
            tv = _typed_part(raw, part_types.get(c, "string"))
            fstats.setdefault(c, [tv, tv])
        keep = True
        for col, op, v in predicates:
            if col not in fstats:
                continue
            mn, mx = fstats[col]
            if mn is None or mx is None:
                # no non-null values in this file: a comparison predicate
                # (null-rejecting by SQL semantics) can never match
                keep = False
                break
            if op == "in":
                vals = list(v)
                # prune only when EVERY member is stat-comparable and
                # NONE can fall inside [mn, max] — a type-mismatched
                # member means "can't prove", so the file is kept
                if all(_stat_comparable(x, mn) for x in vals) and not any(
                    mn <= x <= mx for x in vals
                ):
                    keep = False
                    break
                continue
            if not _stat_comparable(v, mn):
                continue
            if (
                (op == "=" and not (mn <= v <= mx))
                or (op == "<" and not mn < v)
                or (op == "<=" and not mn <= v)
                or (op == ">" and not mx > v)
                or (op == ">=" and not mx >= v)
            ):
                keep = False
                break
        if keep:
            out.append(rel)
    return out


def _bloom_prune(
    spark: SparkSession,
    m: dict,
    schema: StructType,
    kept: list[str],
    predicates,
) -> list[str]:
    """Bloom-filter file pruning for EQUALITY/IN predicates — the
    point-lookup companion to ``files_matching``'s [min, max] stats,
    shared by ``scan_table`` and the copy-on-write rewrite path
    (``delete_rows``/``update_rows``): a key-IN delete wave on a
    bloom-indexed column rewrites only the files whose bitmap admits a
    member, carrying the rest by reference. A bloom miss is definite,
    so the prune stays conservative; files without a bitmap for the
    column are always kept."""
    bloom_meta = m.get("bloom_meta", {})
    if not kept or not bloom_meta:
        return kept
    fields = {f.name: f.dataType.simpleString() for f in schema.fields}
    blooms = m.get("blooms", {})
    for col, op, v in predicates:
        if op not in ("=", "in") or col not in bloom_meta or col not in fields:
            continue
        meta = bloom_meta[col]
        vals = list(v) if op == "in" else [v]
        # ONE engine job hashes the whole literal list (a per-value
        # job made a 200-term IN wave cost 200 scheduler round
        # trips — ~5 s of pure overhead); None (any uncastable
        # literal) disables bloom pruning for this predicate
        pos_sets = _bloom_positions_many(
            spark, fields[col], vals, int(meta["bits"]), int(meta["hashes"])
        )
        if pos_sets is None:
            continue
        # a file survives when ANY member may be present (IN is a
        # disjunction); "=" is the single-member case
        kept = [
            rel
            for rel in kept
            if (b := blooms.get(rel, {}).get(col)) is None
            or any(_bloom_contains(b, p) for p in pos_sets)
        ]
    return kept


def scan_table(
    spark: SparkSession,
    path: str,
    predicates=(),
    version: int | None = None,
) -> DataFrame:
    """Predicate-pruned snapshot read: resolve the manifest, drop every
    data file whose [min, max] stats prove it cannot contain a matching
    row, read only the survivors, and STILL apply the predicates as a
    Spark filter (row-group/page pruning inside kept files plus
    correctness independent of stats). At 100 TB this is the difference
    between listing-then-opening a million files and touching the
    handful a time/key range actually hits — the same file-skipping
    contract Delta/Iceberg readers provide, on plain parquet + JSON.
    Stats come from ``write_table(..., stats_cols=...)``; compacting
    with ``sort_cols`` on the filter columns tightens per-file ranges
    and multiplies the skip rate (clustering IS the index). EQUALITY
    predicates additionally consult per-file bloom filters
    (``write_table(..., bloom_cols=...)``) — the point-lookup index for
    keys whose per-file [min, max] spans everything; a miss is
    definite, a hit is probabilistic, and rows are still filtered, so
    false positives only cost IO."""
    root = path.rstrip("/")
    m = (
        read_manifest(spark, root, version)
        if version is not None
        else latest_manifest(spark, root)
    )
    if m is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    schema = StructType.fromJson(json.loads(m["schema"]))
    kept = _bloom_prune(spark, m, schema, files_matching(m, predicates), predicates)
    df = _read_files(spark, m, root, kept)
    for col, op, v in predicates:
        c = F.col(col)
        if op == "in":
            df = df.filter(c.isin(list(v)))
        else:
            df = df.filter(
                {"=": c == v, "<": c < v, "<=": c <= v, ">": c > v, ">=": c >= v}[op]
            )
    return df


def _txn_skip(head: dict | None, txn: tuple[str, int] | None) -> bool:
    """True when this (app, batch) is already reflected in the head —
    the exactly-once replay guard."""
    if txn is None or head is None:
        return False
    app, batch = txn
    last = head.get("txn", {}).get(app)
    return last is not None and int(batch) <= int(last)


def _merged_txn(head: dict | None, txn: tuple[str, int] | None) -> dict:
    out = dict((head or {}).get("txn", {}))
    if txn is not None:
        out[txn[0]] = int(txn[1])
    return out


# ---------------------------------------------------------------------------
# Public table API
# ---------------------------------------------------------------------------


def _evolved_schema(head_json: str, staged_json: str, schema_mode: str) -> str:
    """The schema an append commits.

    ``strict`` (default) requires the staged schema to match the
    table's exactly (names, order, types — nullability is ignored, it
    relaxes on any parquet round-trip) and keeps the head's json.
    ``merge`` unions them Delta-mergeSchema-style: shared columns must
    agree on type; columns new to the batch are APPENDED (older files
    read them as null), columns missing from the batch stay (the new
    files read them as null). Anything else — a type change — raises:
    silent coercion over petabytes of immutable files is exactly the
    bug a table format exists to prevent."""
    if head_json == staged_json:
        return head_json
    head_s = StructType.fromJson(json.loads(head_json))
    new_s = StructType.fromJson(json.loads(staged_json))
    head_t = {f.name: f.dataType for f in head_s.fields}
    new_t = {f.name: f.dataType for f in new_s.fields}
    conflicts = sorted(
        n for n in head_t.keys() & new_t.keys() if head_t[n] != new_t[n]
    )
    if conflicts:
        raise ValueError(
            "append schema changes column types "
            + str([
                (n, head_t[n].simpleString(), new_t[n].simpleString())
                for n in conflicts
            ])
            + " — rewrite the table (mode='overwrite') to change a type"
        )
    if schema_mode == "strict":
        if set(head_t) == set(new_t) and [f.name for f in head_s.fields] == [
            f.name for f in new_s.fields
        ]:
            return head_json  # nullability-only drift
        raise ValueError(
            f"append schema {sorted(new_t)} != table schema {sorted(head_t)} "
            "— pass schema_mode='merge' to evolve (adds nullable columns)"
        )
    if schema_mode != "merge":
        raise ValueError(f"schema_mode must be strict|merge, got {schema_mode!r}")
    merged = StructType(
        [StructField(f.name, f.dataType, True) for f in head_s.fields]
        + [
            StructField(f.name, f.dataType, True)
            for f in new_s.fields
            if f.name not in head_t
        ]
    )
    return merged.json()


def write_table(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    txn: tuple[str, int] | None = None,
    stats_cols: tuple[str, ...] = (),
    schema_mode: str = "strict",
    bloom_cols: tuple[str, ...] = (),
    bloom_bits: int = _BLOOM_DEFAULT_BITS,
    bloom_hashes: int = _BLOOM_DEFAULT_HASHES,
    partition_by: tuple[str, ...] = (),
    properties: dict | None = None,
) -> dict | None:
    """Commit ``df`` as the table's next snapshot.

    ``properties`` is the table's free-form JSON property map (engine
    metadata that must VERSION with the data — e.g. an ANN index's
    centroids/codebooks). Passing a dict sets/replaces it on this
    commit; passing None carries the head's map unchanged. Every other
    commit path (append, rewrite, compaction, drop_partition, restore)
    carries properties forward, and ``restore_table`` restores the
    target version's map verbatim — so metadata rolls back WITH the
    data it describes. Read with ``table_properties``.

    ``mode='overwrite'`` replaces the file list; ``mode='append'``
    unions it with the current snapshot's. Either way the data files
    are fully written BEFORE the manifest publishes, so readers see the
    old snapshot until the commit instant and the new one after —
    never a mix.

    ``partition_by`` lays files out in hive ``col=value`` directories
    and records each file's partition values in the manifest, so
    ``scan_table`` prunes partition predicates EXACTLY (min == max ==
    the path value) with zero stats jobs, ``table_partitions`` lists
    partitions from metadata alone, and ``drop_partition`` removes one
    as a metadata-only commit. The layout is declared at table creation
    and inherited by every append (passing a different layout raises).
    ``mode='overwrite_partitions'`` is the incremental-ETL write: only
    the partitions PRESENT in ``df`` are replaced (their head files
    drop, everything else is carried by reference) — the daily-reload
    pattern that otherwise needs a read-modify-write of the whole
    table. Partition columns live in paths, not files, so they cannot
    carry file stats or blooms (declare other columns for those).

    ``txn=(app_id, batch_id)`` makes the commit idempotent under
    replay: if the head manifest already reflects a batch >= batch_id
    for app_id, nothing is committed (returns None) — the streaming
    exactly-once guard. Replay skips are detected BEFORE staging when
    possible, so a replayed batch usually costs zero Spark jobs.

    ``stats_cols`` collects per-file [min, max] for those columns into
    the manifest (one column-pruned aggregate job over the staged
    files), enabling ``scan_table`` file skipping. Appends keep the
    head's stats for its files and add stats for the new ones. The
    same job records per-file ROW COUNTS (every commit path does), so
    ``table_row_count`` answers COUNT(*) from manifest metadata alone.

    ``schema_mode`` guards appends: ``strict`` (default) rejects any
    schema drift; ``merge`` evolves by union — new columns are
    appended as nullable (old files read them as null), shared columns
    must keep their exact type (``_evolved_schema``).

    ``bloom_cols`` collects a per-file BLOOM FILTER for those columns
    (riding the same single stats job), enabling ``scan_table`` file
    skipping on EQUALITY predicates where [min, max] can't help — a
    point lookup on a high-cardinality hash-like key (doc_id, user_id)
    overlaps every file's range, but only the files that actually hold
    the key pass its bloom. Appends inherit the table's bloom columns
    automatically (the spec lives in the manifest's ``bloom_meta``),
    so one declaration at table creation covers every later writer."""
    if mode not in ("overwrite", "append", "overwrite_partitions"):
        raise ValueError(
            "write_table mode must be overwrite|append|overwrite_partitions, "
            f"got {mode!r}"
        )
    spark = df.sparkSession
    head0 = latest_manifest(spark, path)
    if _txn_skip(head0, txn):
        return None
    pb = tuple(partition_by)
    head_pb = tuple((head0 or {}).get("partition_by", ()))
    if mode != "overwrite" and head0 is not None:
        if pb and pb != head_pb:
            raise ValueError(
                f"table is partitioned by {head_pb!r}; cannot {mode} with "
                f"partition_by={pb!r}"
            )
        pb = head_pb  # layout is a table property — appends inherit it
    if mode == "overwrite_partitions" and not pb:
        raise ValueError(
            "overwrite_partitions requires a partitioned table "
            "(declare partition_by at creation)"
        )
    if pb:
        missing_pc = [c for c in pb if c not in df.columns]
        if missing_pc:
            raise ValueError(f"partition_by {missing_pc!r} not in {df.columns}")
        clash = sorted(set(pb) & (set(stats_cols) | set(bloom_cols)))
        if clash:
            raise ValueError(
                f"partition columns {clash!r} cannot carry stats/blooms — "
                "their value is exact from the path already"
            )
    bloom_spec = _bloom_effective_spec(
        head0 if mode != "overwrite" else None,
        tuple(bloom_cols),
        bloom_bits,
        bloom_hashes,
    )
    staged, schema_json = _stage_data(df, path, pb)
    # partition columns live in paths, not files: the stats job reads
    # the staged leaves with the schema MINUS partition columns
    stats_schema = StructType(
        [f for f in df.schema.fields if f.name not in set(pb)]
    )
    staged_stats, staged_rows, staged_blooms = _collect_stats(
        spark, path.rstrip("/"), staged, stats_schema, tuple(stats_cols), bloom_spec
    )
    staged_parts = (
        {rel: _partition_values(rel, pb) for rel in staged} if pb else {}
    )

    def build(head: dict | None) -> dict | None:
        if _txn_skip(head, txn):
            return None  # competing replay landed first
        files = staged
        stats = staged_stats
        rows = staged_rows
        blooms = staged_blooms
        meta = bloom_spec
        schema_out = schema_json
        parts = staged_parts
        props = dict(properties) if properties is not None else dict(
            (head or {}).get("properties", {})
        )
        if mode != "overwrite" and head is not None:
            if tuple(head.get("partition_by", ())) != pb:
                # a competing overwrite changed the table's layout while
                # we staged under the old one — our files are laid out
                # wrong for the new table; retrying can't fix that
                raise RuntimeError(
                    f"partition layout changed concurrently at {path} "
                    f"({head.get('partition_by')!r} != {pb!r}) — re-run"
                )
            head_files = head["files"]
            if mode == "overwrite_partitions":
                replaced = {
                    tuple(sorted(v.items())) for v in staged_parts.values()
                }
                head_parts = head.get("parts", {})
                head_files = [
                    rel
                    for rel in head_files
                    if tuple(sorted(head_parts.get(rel, {}).items()))
                    not in replaced
                ]
            carried = set(head_files)
            files = head_files + staged
            stats = {
                **{
                    r: s
                    for r, s in head.get("stats", {}).items()
                    if r in carried
                },
                **staged_stats,
            }
            rows = {
                **{
                    r: n
                    for r, n in head.get("rows", {}).items()
                    if r in carried
                },
                **staged_rows,
            }
            parts = {
                **{
                    r: v
                    for r, v in head.get("parts", {}).items()
                    if r in carried
                },
                **staged_parts,
            }
            # a competing writer may have introduced a column first; its
            # sizing wins so the table stays internally consistent
            meta = {**bloom_spec, **head.get("bloom_meta", {})}
            # staged bitmaps were computed with THIS writer's pre-race
            # sizing; where the winning sizing differs, the bitmap's bit
            # positions are probe-incompatible — drop those columns'
            # staged bitmaps (missing bitmap = scan keeps the file, the
            # conservative outcome) instead of publishing garbage that
            # would silently prune files that hold the key
            mismatched = {
                c
                for c, m in meta.items()
                if c in bloom_spec
                and (
                    int(m["bits"]) != int(bloom_spec[c]["bits"])
                    or int(m["hashes"]) != int(bloom_spec[c]["hashes"])
                )
            }
            safe_staged = staged_blooms
            if mismatched:
                safe_staged = {
                    rel: {c: b for c, b in bm.items() if c not in mismatched}
                    for rel, bm in staged_blooms.items()
                }
                safe_staged = {rel: bm for rel, bm in safe_staged.items() if bm}
            blooms = {
                **{
                    r: b
                    for r, b in head.get("blooms", {}).items()
                    if r in carried
                },
                **safe_staged,
            }
            schema_out = _evolved_schema(head["schema"], schema_json, schema_mode)
        return {
            "files": files,
            "schema": schema_out,
            "txn": _merged_txn(head, txn),
            **({"stats": stats} if stats else {}),
            **({"rows": rows} if rows else {}),
            **({"bloom_meta": meta} if meta else {}),
            **({"blooms": blooms} if blooms else {}),
            **({"partition_by": list(pb)} if pb else {}),
            **({"parts": parts} if parts else {}),
            **({"properties": props} if props else {}),
        }

    return _commit(spark, path, build, mode)


def table_row_count(
    spark: SparkSession, path: str, version: int | None = None
) -> int:
    """COUNT(*) from manifest metadata alone — zero data files opened.

    Every commit path records per-file row counts (the count rides the
    stats aggregate when stats are collected, or a footer-metadata-only
    count job otherwise), so the table's cardinality is the sum of the
    manifest's ``rows`` map. Falls back to one real metadata count over
    any file the manifest lacks an entry for (e.g. a table written
    before this field existed) — never a wrong answer, just a slower
    one. At 100 TB this is the difference between an O(manifest) driver
    sum and a million-file scan for the most common query there is."""
    root = path.rstrip("/")
    m = (
        read_manifest(spark, root, version)
        if version is not None
        else latest_manifest(spark, root)
    )
    if m is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    rows = m.get("rows", {})
    known = [rel for rel in m["files"] if rel in rows]
    missing = [rel for rel in m["files"] if rel not in rows]
    total = sum(int(rows[rel]) for rel in known)
    if missing:
        total += _read_files(spark, m, root, missing).count()
    return total


def table_properties(
    spark: SparkSession, path: str, version: int | None = None
) -> dict:
    """The table's free-form property map at ``version`` (default
    head) — metadata-only, zero data files opened. Set via
    ``write_table(..., properties=...)``; carried by every commit path
    and restored verbatim by ``restore_table``."""
    root = path.rstrip("/")
    m = (
        read_manifest(spark, root, version)
        if version is not None
        else latest_manifest(spark, root)
    )
    if m is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    return dict(m.get("properties", {}))


def table_partitions(
    spark: SparkSession, path: str, version: int | None = None
) -> list[dict]:
    """The table's partitions from manifest metadata alone — zero data
    files opened: one dict per distinct partition-value tuple with
    ``values`` (column -> string-or-None, the hive path form),
    ``n_files``, and ``n_rows`` (None when any member file predates row
    counting). Sorted by the stringified values for determinism. At
    100 TB this is the partition listing a catalog query (SHOW
    PARTITIONS) answers without touching storage."""
    root = path.rstrip("/")
    m = (
        read_manifest(spark, root, version)
        if version is not None
        else latest_manifest(spark, root)
    )
    if m is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    if not m.get("partition_by"):
        raise ValueError(f"table at {path} is not partitioned")
    parts = m.get("parts", {})
    rows = m.get("rows", {})
    agg: dict[tuple, dict] = {}
    for rel in m["files"]:
        key = tuple(sorted(parts.get(rel, {}).items()))
        e = agg.setdefault(
            key, {"values": dict(key), "n_files": 0, "n_rows": 0}
        )
        e["n_files"] += 1
        if e["n_rows"] is not None:
            e["n_rows"] = (
                e["n_rows"] + int(rows[rel]) if rel in rows else None
            )
    return [agg[k] for k in sorted(agg, key=str)]


def drop_partition(
    spark: SparkSession, path: str, values: dict
) -> dict | None:
    """Remove every file of the partition(s) matching ``values``
    ({col: value-string or None}) as a METADATA-ONLY commit — no data
    file is read, rewritten, or deleted (``vacuum_table`` reclaims
    later, so pinned readers keep working). ``values`` may cover a
    prefix of the partition columns (drop a whole date across
    sub-partitions). Returns the new manifest, or None when nothing
    matched (no empty commit). The GDPR/retention fast path on a
    partitioned table: O(manifest) where ``delete_rows`` is O(files
    rewritten)."""
    head = latest_manifest(spark, path)
    if head is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    pb = head.get("partition_by", ())
    bad = sorted(set(values) - set(pb))
    if not pb or bad:
        raise ValueError(
            f"drop_partition keys {sorted(values)!r} must be partition "
            f"columns {list(pb)!r}"
        )
    parts = head.get("parts", {})
    want = {k: (None if v is None else str(v)) for k, v in values.items()}

    def matches(rel: str) -> bool:
        p = parts.get(rel, {})
        return all(k in p and p[k] == v for k, v in want.items())

    dropped = [rel for rel in head["files"] if matches(rel)]
    if not dropped:
        return None
    kept = [rel for rel in head["files"] if rel not in set(dropped)]

    def build(h: dict | None) -> dict:
        if h is None or h["version"] != head["version"]:
            raise RuntimeError(
                f"concurrent commit during drop_partition at {path} — re-run"
            )
        keep = set(kept)
        return {
            "files": kept,
            "schema": h["schema"],
            "txn": _merged_txn(h, None),
            **{
                k: {r: v for r, v in h[k].items() if r in keep}
                for k in ("stats", "rows", "blooms", "parts")
                if h.get(k)
            },
            **({"bloom_meta": h["bloom_meta"]} if h.get("bloom_meta") else {}),
            **({"properties": h["properties"]} if h.get("properties") else {}),
            "partition_by": list(pb),
        }

    out = _commit(spark, path, build, "drop_partition")
    assert out is not None
    out["files_dropped"] = len(dropped)
    return out


def snapshot(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """The table's snapshot as a DataFrame — the latest version, or a
    time-traveled earlier one. The plan reads the manifest's EXPLICIT
    file list, so it stays consistent even if merges/compactions commit
    while it runs (their files are new directories; only ``vacuum_table``
    deletes, and it only reclaims versions you asked it to drop)."""
    root = path.rstrip("/")
    m = (
        read_manifest(spark, root, version)
        if version is not None
        else latest_manifest(spark, root)
    )
    if m is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    return _read_files(spark, m, root, m["files"])


def _reject_partitioned(head: dict | None, path: str, op: str) -> None:
    """merge_table / compact_table re-stage the WHOLE snapshot
    unpartitioned, which would silently drop the table's layout (and
    its exact pruning) — refuse with a clear error instead. Partitioned
    tables get their own cheap paths (overwrite_partitions,
    drop_partition, compact_partition), and row-level delete_rows /
    update_rows restage partitioned and work unchanged."""
    if head and head.get("partition_by"):
        raise ValueError(
            f"{op} does not support partitioned tables (partition_by="
            f"{head['partition_by']!r} at {path}); use "
            "mode='overwrite_partitions' / drop_partition instead"
        )


def merge_table(
    path: str,
    batch: DataFrame,
    key_cols: tuple[str, ...],
    tombstone_col: str | None = None,
    stats_cols: tuple[str, ...] = (),
) -> dict:
    """MERGE INTO with an atomic commit: apply the change batch
    (updates / inserts / tombstone deletes — ``operators/upsert.
    merge_snapshot``) to the current snapshot and publish the result as
    the next version. Readers either see the pre-merge snapshot or the
    post-merge one; the in-between state (new files written, manifest
    not yet renamed) is invisible.

    The merge is computed against the snapshot resolved at call time
    and staged before the commit loop; if another writer commits in
    between, the commit is NOT blindly retried (the merged data would
    be stale) — it raises, and the caller re-runs the merge. CDC
    appliers are single-writer in practice; the raise turns a silent
    lost-update into an explicit retry."""
    from ensembl_database_loader_spark.operators.upsert import merge_snapshot

    spark = batch.sparkSession
    base_head = latest_manifest(spark, path)
    _reject_partitioned(base_head, path, "merge_table")
    if base_head is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    bloom_spec = _bloom_effective_spec(
        base_head, (), _BLOOM_DEFAULT_BITS, _BLOOM_DEFAULT_HASHES
    )
    snap = snapshot(spark, path, base_head["version"])
    merged = merge_snapshot(snap, batch, key_cols, tombstone_col)
    staged, schema_json = _stage_data(merged, path)
    stats, row_counts, blooms = _collect_stats(
        spark, path.rstrip("/"), staged, merged.schema, tuple(stats_cols), bloom_spec
    )

    def build(head: dict | None) -> dict:
        if head is None or head["version"] != base_head["version"]:
            raise RuntimeError(
                f"concurrent commit during merge at {path} "
                f"(expected head {base_head['version']}, "
                f"found {head['version'] if head else None}) — re-run the merge"
            )
        return {
            "files": staged,
            "schema": schema_json,
            "txn": _merged_txn(head, None),
            **({"stats": stats} if stats else {}),
            **({"rows": row_counts} if row_counts else {}),
            **({"bloom_meta": bloom_spec} if bloom_spec else {}),
            **({"blooms": blooms} if blooms else {}),
            **(
                {"properties": head["properties"]}
                if head.get("properties")
                else {}
            ),
        }

    out = _commit(spark, path, build, "merge")
    assert out is not None
    return out


def zorder_value(df: DataFrame, cols: tuple[str, ...], bits: int = 16) -> DataFrame:
    """Add ``_z``: the Morton (Z-order) interleaving of ``cols``.

    Each column is min-max normalized to a ``bits``-wide integer (one
    tiny 2-value-per-column aggregate supplies the bounds), then the
    bit planes are interleaved so rows close in EVERY dimension get
    close z-values. Sorting files by ``_z`` gives each file a tight
    [min, max] box on ALL the z-ordered columns simultaneously — a
    single-column sort optimizes one column's skipping and destroys
    the others'. Pure bitwise/arithmetic Spark expressions: map-side,
    whole-stage-codegen, no UDF."""
    if not cols:
        raise ValueError("zorder_value needs at least one column")
    bounds = df.agg(
        *[
            x
            for c in cols
            for x in (
                F.min(F.col(c).cast("double")).alias(f"__mn_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__mx_{c}"),
            )
        ]
    ).first()
    scaled = []
    top = (1 << bits) - 1
    for c in cols:
        mn, mx = bounds[f"__mn_{c}"], bounds[f"__mx_{c}"]
        if mn is None or mx is None or mx == mn:
            scaled.append(F.lit(0).cast("bigint"))
            continue
        frac = (F.col(c).cast("double") - F.lit(float(mn))) / F.lit(float(mx - mn))
        scaled.append(
            F.least(F.lit(top), F.floor(frac * (1 << bits)).cast("bigint"))
        )
    z = F.lit(0).cast("bigint")
    n = len(cols)
    for b in range(bits):
        for i, s in enumerate(scaled):
            z = z + F.shiftleft(
                F.shiftright(s, b).bitwiseAND(F.lit(1)), b * n + i
            ).cast("bigint")
    return df.withColumn("_z", z)


def compact_table(
    spark: SparkSession,
    path: str,
    target_bytes: int = 128 << 20,
    sort_cols: tuple[str, ...] = (),
    stats_cols: tuple[str, ...] = (),
    zorder_cols: tuple[str, ...] = (),
) -> dict:
    """Small-file compaction as a commit: rewrite the current snapshot
    into ~``target_bytes`` files (optionally sorted to restore min/max
    clustering) and publish. Unlike ``maintenance.compact_parquet``'s
    two-rename swap, there is NO window where the table is missing or
    doubled: old files stay on disk until ``vacuum_table``, so
    snapshots resolved before the compaction keep reading bit-identical
    data. Returns the new manifest (with ``files_before``/
    ``files_after`` stats attached).

    ``sort_cols`` uses repartitionByRange + sortWithinPartitions, so
    each output file covers a DISJOINT range of the sort key — with
    ``stats_cols`` on the same columns, a point/range ``scan_table``
    predicate then skips all but ~one file (clustering is the index:
    the compaction that fixes small files is the same one that makes
    file skipping effective).

    ``zorder_cols`` clusters on the MORTON interleaving of several
    columns instead (``zorder_value``): each file gets a tight stats
    box on every listed column at once, so predicates on ANY of them
    skip files — the multi-dimension layout a lone sort can't give."""
    if sort_cols and zorder_cols:
        raise ValueError("pass sort_cols or zorder_cols, not both")
    head = latest_manifest(spark, path)
    _reject_partitioned(head, path, "compact_table")
    if head is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    root = path.rstrip("/")
    total = _total_size(spark, root, head["files"])
    n_out = max(1, math.ceil(total / target_bytes))
    df = snapshot(spark, path, head["version"])
    if zorder_cols:
        df = (
            zorder_value(df, tuple(zorder_cols))
            .repartitionByRange(n_out, "_z")
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    elif sort_cols:
        df = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n_out)
    bloom_spec = _bloom_effective_spec(
        head, (), _BLOOM_DEFAULT_BITS, _BLOOM_DEFAULT_HASHES
    )
    staged, schema_json = _stage_data(df, path)
    stats, row_counts, blooms = _collect_stats(
        spark, root, staged, df.schema, tuple(stats_cols), bloom_spec
    )

    def build(h: dict | None) -> dict:
        if h is None or h["version"] != head["version"]:
            raise RuntimeError(
                f"concurrent commit during compaction at {path} — re-run"
            )
        return {
            "files": staged,
            "schema": schema_json,
            "txn": _merged_txn(h, None),
            **({"stats": stats} if stats else {}),
            **({"rows": row_counts} if row_counts else {}),
            **({"bloom_meta": bloom_spec} if bloom_spec else {}),
            **({"blooms": blooms} if blooms else {}),
            **(
                {"properties": head["properties"]}
                if head.get("properties")
                else {}
            ),
        }

    out = _commit(spark, path, build, "compact")
    assert out is not None
    out["files_before"] = len(head["files"])
    out["files_after"] = len(staged)
    return out


def compact_partition(
    spark: SparkSession,
    path: str,
    values: dict,
    target_bytes: int = 128 << 20,
    sort_cols: tuple[str, ...] = (),
    stats_cols: tuple[str, ...] = (),
) -> dict | None:
    """Small-file compaction scoped to ONE partition of a hive-
    partitioned table — the maintenance loop a streaming-fed partition
    needs (every micro-batch appends a file; this folds them back to
    ~``target_bytes``). ``values`` must name every partition column
    (exactly one partition compacts per call — at 100 TB you compact
    the partitions whose file counts drifted, never the whole table).
    Only that partition's files rewrite; every other file is carried by
    reference, so the commit is as cheap as the partition is small.
    Returns None when the partition has fewer than two files (nothing
    to fold). ``sort_cols`` restores min/max clustering within the
    partition for stats-based skipping inside it."""
    head = latest_manifest(spark, path)
    if head is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    pb = tuple(head.get("partition_by", ()))
    if not pb or set(values) != set(pb):
        raise ValueError(
            f"compact_partition values must name exactly the partition "
            f"columns {list(pb)!r}, got {sorted(values)!r}"
        )
    clash = sorted(set(pb) & set(stats_cols))
    if clash:
        raise ValueError(
            f"partition columns {clash!r} cannot carry stats — their "
            "value is exact from the path already"
        )
    root = path.rstrip("/")
    parts = head.get("parts", {})
    want = {k: (None if v is None else str(v)) for k, v in values.items()}
    matched = [
        rel
        for rel in head["files"]
        if all(parts.get(rel, {}).get(k) == v for k, v in want.items())
    ]
    if len(matched) < 2:
        return None
    total = _total_size(spark, root, matched)
    n_out = max(1, math.ceil(total / target_bytes))
    df = _read_files(spark, head, root, matched)
    if sort_cols:
        df = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(n_out)
    bloom_spec = _bloom_effective_spec(
        head, (), _BLOOM_DEFAULT_BITS, _BLOOM_DEFAULT_HASHES
    )
    staged, _schema_json = _stage_data(df, path, pb)
    stats_schema = StructType(
        [f for f in df.schema.fields if f.name not in set(pb)]
    )
    staged_stats, staged_rows, staged_blooms = _collect_stats(
        spark, root, staged, stats_schema, tuple(stats_cols), bloom_spec
    )
    staged_parts = {rel: _partition_values(rel, pb) for rel in staged}

    def build(h: dict | None) -> dict:
        if h is None or h["version"] != head["version"]:
            raise RuntimeError(
                f"concurrent commit during compact_partition at {path} — re-run"
            )
        gone = set(matched)
        kept = [rel for rel in h["files"] if rel not in gone]
        keep = set(kept)
        return {
            "files": kept + staged,
            "schema": h["schema"],
            "txn": _merged_txn(h, None),
            "stats": {
                **{r: s for r, s in h.get("stats", {}).items() if r in keep},
                **staged_stats,
            },
            "rows": {
                **{r: n for r, n in h.get("rows", {}).items() if r in keep},
                **staged_rows,
            },
            **(
                {"bloom_meta": h["bloom_meta"], "blooms": {
                    **{r: b for r, b in h.get("blooms", {}).items() if r in keep},
                    **staged_blooms,
                }}
                if h.get("bloom_meta")
                else {}
            ),
            "partition_by": list(pb),
            "parts": {
                **{r: v for r, v in parts.items() if r in keep},
                **staged_parts,
            },
            **({"properties": h["properties"]} if h.get("properties") else {}),
        }

    out = _commit(spark, path, build, "compact_partition")
    assert out is not None
    out["files_before"] = len(matched)
    out["files_after"] = len(staged)
    return out


def replace_partitions(
    spark: SparkSession,
    path: str,
    values_list: list[dict],
    df: DataFrame,
    stats_cols: tuple[str, ...] = (),
    properties: dict | None = None,
    txn: tuple[str, int] | None = None,
) -> dict | None:
    """Replace the files of the named partitions with ``df``'s rows —
    and optionally advance table PROPERTIES — as ONE atomic commit;
    every other file is carried by reference. The surgical-maintenance
    primitive partial index rebuilds need (``split_hot_cells``): a
    drop_partition + append + properties update would be three commits
    with readers seeing each intermediate state, and ``mode='overwrite'``
    rewrites the world. ``df`` may introduce NEW partition values (a
    hot partition splitting into several), and each ``values_list``
    entry must name every partition column (``compact_partition``'s
    contract). A replayed ``txn`` commits nothing — checked BEFORE any
    Spark work, so replaying an expensive maintenance job costs one
    manifest read (ADVICE r12). Returns the commit dict (plus
    ``files_rewritten``/``files_untouched``) or None on replay.

    Guards (r12 self-review): ``df``'s schema must match the table's
    exactly (the append path's strict contract — a missing column
    would otherwise commit fine and read back as silent NULLs), and
    ``df``'s rows may land only in the NAMED partitions or in
    partitions NEW to the table (rows for an unnamed existing
    partition would duplicate its still-referenced files' rows)."""
    head = latest_manifest(spark, path)
    if head is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    if _txn_skip(head, txn):
        return None
    pb = tuple(head.get("partition_by", ()))
    if not pb:
        raise ValueError(f"table at {path} is not partitioned")
    for values in values_list:
        if set(values) != set(pb):
            raise ValueError(
                f"each values dict must name exactly the partition columns "
                f"{list(pb)!r}, got {sorted(values)!r}"
            )
    clash = sorted(set(pb) & set(stats_cols))
    if clash:
        raise ValueError(
            f"partition columns {clash!r} cannot carry stats — their "
            "value is exact from the path already"
        )
    # strict schema gate BEFORE any file is written (nullability-only
    # drift passes, anything else raises — _evolved_schema's contract)
    _evolved_schema(head["schema"], df.schema.json(), "strict")
    root = path.rstrip("/")
    parts = head.get("parts", {})
    wants = [
        {k: (None if v is None else str(v)) for k, v in values.items()}
        for values in values_list
    ]
    matched = [
        rel
        for rel in head["files"]
        if any(
            all(parts.get(rel, {}).get(k) == v for k, v in want.items())
            for want in wants
        )
    ]
    bloom_spec = _bloom_effective_spec(
        head, (), _BLOOM_DEFAULT_BITS, _BLOOM_DEFAULT_HASHES
    )
    staged, _schema_json = _stage_data(df, path, pb)
    # row-containment gate: staged rows may land only in the NAMED
    # partitions or in partitions NEW to the table — anything else
    # would double-serve next to the partition's still-referenced
    # files. Checked from the staged hive paths (no extra job); a
    # violation aborts before commit (the staged files are orphans
    # until a manifest references them — remove_orphans reclaims).
    want_keys = {tuple(sorted(w.items())) for w in wants}
    existing = {
        tuple(sorted(v.items())) for v in parts.values()
    }
    for rel in staged:
        key = tuple(sorted(_partition_values(rel, pb).items()))
        if key not in want_keys and key in existing:
            raise ValueError(
                f"replace_partitions: staged rows land in existing "
                f"partition {dict(key)!r} which is not in values_list — "
                "name it or drop those rows"
            )
    stats_schema = StructType(
        [f for f in df.schema.fields if f.name not in set(pb)]
    )
    staged_stats, staged_rows, staged_blooms = _collect_stats(
        spark, root, staged, stats_schema, tuple(stats_cols), bloom_spec
    )
    staged_parts = {rel: _partition_values(rel, pb) for rel in staged}

    def build(h: dict | None) -> dict:
        if h is None or h["version"] != head["version"]:
            raise RuntimeError(
                f"concurrent commit during replace_partitions at {path} — re-run"
            )
        gone = set(matched)
        kept = [rel for rel in h["files"] if rel not in gone]
        keep = set(kept)
        return {
            "files": kept + staged,
            "schema": h["schema"],
            "txn": _merged_txn(h, txn),
            "stats": {
                **{r: s for r, s in h.get("stats", {}).items() if r in keep},
                **staged_stats,
            },
            "rows": {
                **{r: n for r, n in h.get("rows", {}).items() if r in keep},
                **staged_rows,
            },
            **(
                {"bloom_meta": h["bloom_meta"], "blooms": {
                    **{r: b for r, b in h.get("blooms", {}).items() if r in keep},
                    **staged_blooms,
                }}
                if h.get("bloom_meta")
                else {}
            ),
            "partition_by": list(pb),
            "parts": {
                **{r: v for r, v in parts.items() if r in keep},
                **staged_parts,
            },
            **(
                {"properties": properties}
                if properties is not None
                else ({"properties": h["properties"]} if h.get("properties") else {})
            ),
        }

    out = _commit(spark, path, build, "replace_partitions")
    assert out is not None
    out["files_rewritten"] = len(matched)
    out["files_untouched"] = len(head["files"]) - len(matched)
    return out


def partitions_needing_compaction(
    spark: SparkSession,
    path: str,
    max_files: int = 16,
) -> list[dict]:
    """The maintenance worklist for a streaming-fed partitioned table:
    partitions whose file count exceeds ``max_files``, sorted by file
    count descending — feed each ``values`` straight into
    ``compact_partition``. Pure manifest metadata (zero data files
    opened), so the maintenance loop's planning step is free however
    big the table; each entry carries ``values``, ``n_files`` and
    ``n_rows``. Every micro-batch append adds one file per touched
    partition, so without this loop snapshot plan size and small-file
    overhead grow with commit count — run it on whatever cadence keeps
    ``n_files`` bounded (the read path stays O(partitions) regardless
    via ``_read_files``' per-partition grouping; compaction is about
    file-open cost and footer metadata, not plan size)."""
    return [
        p
        for p in sorted(
            table_partitions(spark, path),
            key=lambda p: -p["n_files"],
        )
        if p["n_files"] > int(max_files)
    ]


def _prune_to_where(prune) -> str:
    """AND-combined SQL form of a ``(col, op, value)`` triple list."""
    def _lit(v):
        return "'" + v.replace("'", "''") + "'" if isinstance(v, str) else repr(v)

    parts = []
    for col, op, v in prune:
        if op not in _PRED_OPS:
            raise ValueError(f"unsupported predicate op {op!r} (use one of {_PRED_OPS})")
        if op == "in":
            if not isinstance(v, (list, tuple, set)) or not v:
                raise ValueError(
                    f"'in' predicate on {col!r} needs a non-empty list/tuple/set"
                )
            parts.append(f"(`{col}` IN ({', '.join(_lit(x) for x in v)}))")
        else:
            parts.append(f"(`{col}` {op} {_lit(v)})")
    return " AND ".join(parts)


def _rewrite_rows(
    spark: SparkSession,
    path: str,
    where: str | None,
    prune,
    transform: Callable[[DataFrame, Column], DataFrame],
    operation: str,
    stats_cols: tuple[str, ...] | None,
    properties: dict | None = None,
    append_df: DataFrame | None = None,
    txn: tuple[str, int] | None = None,
) -> dict | None:
    """Shared copy-on-write core of ``delete_rows`` / ``update_rows``
    / ``apply_delta``.

    Resolves the head, stats-prunes the file list to the CANDIDATE
    files that could hold a matching row, rewrites only those through
    ``transform(df, hit)`` (``hit`` = the condition coalesced to false,
    so null-condition rows are untouched — SQL DELETE/UPDATE
    semantics), and commits untouched-files + rewritten-files as the
    next snapshot. Returns None (no commit, no Spark write) when
    pruning proves no file can match or the condition hits zero rows —
    UNLESS ``append_df`` or ``txn`` is given (``apply_delta``): then
    the appended files and/or the txn watermark + properties must
    still publish, so the commit proceeds with the candidate files
    carried untouched.

    The ``prune`` triples are CONJOINED into the effective row
    condition (``where AND prune``), so the file filter and the row
    filter always agree by construction: a stats-based prune that
    skips a file can never skip rows the condition would have touched,
    and a prune NOT implied by ``where`` simply scopes the operation
    (it never silently widens or narrows it relative to the files
    read).
    """
    root = path.rstrip("/")
    head = latest_manifest(spark, root)
    if head is None:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    if _txn_skip(head, txn):
        return None
    delta_mode = append_df is not None or txn is not None
    pb = tuple(head.get("partition_by", ()))
    if where is None and not prune:
        if not delta_mode:
            raise ValueError("pass where=, prune=, or both")
        where = "false"  # append-only delta: no row can match
    elif where is None:
        where = _prune_to_where(prune)
    elif prune:
        where = f"({where}) AND {_prune_to_where(prune)}"
    schema = StructType.fromJson(json.loads(head["schema"]))
    if append_df is not None:
        # validate BEFORE any staging: a schema-drifted arrival frame
        # must not cost writes (and strand orphan files) to be refused
        _evolved_schema(head["schema"], append_df.schema.json(), "strict")
    # files_matching folds partition values in as exact min == max
    # pseudo-stats, so a prune on a partition column scopes the rewrite
    # to that partition's files with zero stats jobs; bloom bitmaps then
    # prove per-file absence for =/IN prune keys (the id-wave delete
    # lever on bloom-indexed tables — r12, VERDICT r11 #5)
    cand = (
        _bloom_prune(
            spark, head, schema, files_matching(head, tuple(prune)), tuple(prune)
        )
        if prune
        else (list(head["files"]) if where != "false" else [])
    )
    cand_set = set(cand)
    if not cand and not delta_mode:
        return None
    # The hit count RIDES the staged write as an Observation (one
    # candidate-file pass total) — the former separate
    # sum(hit)-aggregate job cost every delete/update/apply_delta an
    # extra scheduler round trip and a second scan of the candidate
    # files. Zero-hit waves (rare: pruning already proved a possible
    # match) discard the speculatively staged rewrite and keep the
    # candidates referenced untouched, re-staging only the arrivals —
    # the manifest outcome is IDENTICAL to the two-pass protocol in
    # every case, and rows_affected comes from the observed count.
    n_hit = 0
    staged: list[str] = []
    if cand:
        from pyspark.sql import Observation

        df = _read_files(spark, head, root, cand)
        hit = F.coalesce(F.expr(where), F.lit(False))
        obs = Observation()
        out_df: DataFrame | None = transform(
            df.observe(obs, F.sum(hit.cast("bigint")).alias("n_hit")), hit
        )
        if append_df is not None:
            # ONE staged write for the rewrite AND the arrivals (the
            # union is narrow — each side keeps its own partitioning,
            # so the file layout matches two separate writes at one
            # write job's cost); schemas already strict-validated equal
            out_df = out_df.unionByName(append_df)
        staged, _ = _stage_data(out_df, path, pb)
        n_hit = int(obs.get["n_hit"] or 0)
        if n_hit == 0:
            _remove_staged(spark, root, staged)
            staged = []
            if not delta_mode:
                return None
            # nothing to rewrite: candidates stay referenced as they
            # are; only the arrivals (if any) stage
            cand_set = set()
            untouched = list(head["files"])
            if append_df is not None:
                staged, _ = _stage_data(append_df, path, pb)
        else:
            untouched = [f for f in head["files"] if f not in cand_set]
    else:
        cand_set = set()
        untouched = list(head["files"])
        if append_df is not None:
            staged, _ = _stage_data(append_df, path, pb)
    if stats_cols is None:
        # default: keep the table's existing stat columns alive on the
        # rewritten files (union of columns any head file has stats for)
        inferred: set[str] = set()
        for fstats in head.get("stats", {}).values():
            inferred.update(fstats)
        stats_cols = tuple(sorted(
            c for c in inferred
            if c in {f.name for f in schema.fields} and c not in set(pb)
        ))
    clash = sorted(set(pb) & set(stats_cols))
    if clash:
        raise ValueError(
            f"partition columns {clash!r} cannot carry stats — their "
            "value is exact from the path already"
        )
    bloom_spec = _bloom_effective_spec(
        head, (), _BLOOM_DEFAULT_BITS, _BLOOM_DEFAULT_HASHES
    )
    stats_schema = StructType(
        [f for f in schema.fields if f.name not in set(pb)]
    )
    staged_stats, staged_rows, staged_blooms = _collect_stats(
        spark, root, staged, stats_schema, tuple(stats_cols), bloom_spec
    )
    staged_parts = (
        {rel: _partition_values(rel, pb) for rel in staged} if pb else {}
    )

    def build(h: dict | None) -> dict:
        if h is None or h["version"] != head["version"]:
            raise RuntimeError(
                f"concurrent commit during {operation} at {path} "
                f"(expected head {head['version']}, "
                f"found {h['version'] if h else None}) — re-run"
            )
        stats = {
            rel: s
            for rel, s in h.get("stats", {}).items()
            if rel not in cand_set
        }
        stats.update(staged_stats)
        row_counts = {
            rel: n
            for rel, n in h.get("rows", {}).items()
            if rel not in cand_set
        }
        row_counts.update(staged_rows)
        blooms = {
            rel: b
            for rel, b in h.get("blooms", {}).items()
            if rel not in cand_set
        }
        blooms.update(staged_blooms)
        parts = {
            rel: v
            for rel, v in h.get("parts", {}).items()
            if rel not in cand_set
        }
        parts.update(staged_parts)
        return {
            "files": untouched + staged,
            "schema": head["schema"],
            "txn": _merged_txn(h, txn),
            **({"stats": stats} if stats else {}),
            **({"rows": row_counts} if row_counts else {}),
            **({"bloom_meta": bloom_spec} if bloom_spec else {}),
            **({"blooms": blooms} if blooms else {}),
            **({"partition_by": list(pb)} if pb else {}),
            **({"parts": parts} if parts else {}),
            **(
                # an explicit override replaces the carried map in the
                # SAME commit (safe: build raises on a concurrent head
                # change, so the override was computed from this head)
                {"properties": properties}
                if properties is not None
                else (
                    {"properties": head["properties"]}
                    if head.get("properties")
                    else {}
                )
            ),
        }

    out = _commit(spark, path, build, operation)
    assert out is not None
    out["files_rewritten"] = len(cand_set)
    out["files_untouched"] = len(untouched)
    out["rows_affected"] = n_hit
    return out


def delete_rows(
    spark: SparkSession,
    path: str,
    where: str | None = None,
    prune=(),
    stats_cols: tuple[str, ...] | None = None,
    properties: dict | None = None,
) -> dict | None:
    """Row-level DELETE as a copy-on-write commit — the GDPR-delete /
    bad-shard-purge path a 100 TB lake needs without rewriting the
    table. ``merge_table`` can tombstone keys, but it recomputes and
    rewrites the WHOLE snapshot; this rewrites only the files that can
    contain a matching row.

    - ``where``: SQL boolean expression; rows where it is TRUE are
      deleted (NULL/FALSE rows are kept — SQL DELETE semantics).
    - ``prune``: optional ``(col, op, value)`` triples (scan_table's
      mini-language) used for file skipping via manifest stats AND
      conjoined into the effective row condition (``where AND
      prune``), so the file filter and the row filter always agree —
      a prune scopes the delete (only rows satisfying both go), it can
      never cause rows hiding in pruned-away files to be silently
      missed relative to what the rewrite actually removes. With
      ``where=None`` the condition IS the AND of the triples. On a
      table compacted with ``sort_cols``/``zorder_cols`` on the delete
      key, a key-range delete rewrites ~1 file and carries the rest
      forward untouched; on a partitioned table a partition-column
      prune scopes the rewrite to that partition exactly.
    - Untouched files are REFERENCED by the new manifest, not copied:
      the commit costs one job over candidate files only, and pinned
      readers of older snapshots are unaffected (files are only ever
      reclaimed by ``vacuum_table``).

    Returns the published manifest (with ``files_rewritten`` /
    ``files_untouched`` / ``rows_affected``), or None when no row
    matched (no commit at all — a no-op delete leaves no version).

    Reference analogue: the loader's coarsest delete is DROP DATABASE
    before reload (``Database.pm:56-63``); this is the row-granular
    version with the same "readers see old or new, never a mix"
    contract."""
    return _rewrite_rows(
        spark, path, where, tuple(prune),
        lambda df, hit: df.filter(~hit), "delete", stats_cols,
        properties=properties,
    )


def update_rows(
    spark: SparkSession,
    path: str,
    set_exprs: dict[str, str],
    where: str | None = None,
    prune=(),
    stats_cols: tuple[str, ...] | None = None,
) -> dict | None:
    """Row-level UPDATE as a copy-on-write commit: rows where ``where``
    is TRUE get each ``set_exprs[col]`` (a SQL expression over the
    row's old values, cast back to the column's declared type so the
    schema is preserved exactly); all other rows — and all files the
    ``prune`` stats prove can't match — are carried forward untouched.
    Same pruning contract (prune conjoins into the row condition),
    no-op behavior, and return shape as ``delete_rows``."""
    field_types = None

    def apply_sets(df: DataFrame, hit):
        nonlocal field_types
        field_types = {f.name: f.dataType for f in df.schema.fields}
        unknown = sorted(set(set_exprs) - set(field_types))
        if unknown:
            raise ValueError(
                f"update_rows set columns {unknown!r} not in table schema "
                f"{sorted(field_types)!r}"
            )
        return df.select(
            *[
                F.when(hit, F.expr(set_exprs[c]).cast(field_types[c]))
                .otherwise(F.col(c))
                .alias(c)
                if c in set_exprs
                else F.col(c)
                for c in df.columns
            ]
        )

    return _rewrite_rows(
        spark, path, where, tuple(prune), apply_sets, "update", stats_cols
    )


def apply_delta(
    spark: SparkSession,
    path: str,
    delete_where: str | None = None,
    delete_prune=(),
    append_df: DataFrame | None = None,
    txn: tuple[str, int] | None = None,
    properties: dict | None = None,
    stats_cols: tuple[str, ...] | None = None,
) -> dict | None:
    """Apply one change wave — row deletes AND row arrivals — as ONE
    atomic commit: victims leave via the stats/bloom-pruned
    copy-on-write rewrite (``delete_rows`` semantics: only files that
    can hold a match are touched), arrival files stage beside the
    rewritten ones, and a single manifest publishes both with the
    ``txn`` watermark and ``properties`` override. Readers see the
    table before the wave or after it — never deletes-without-arrivals
    (the gap a delete-commit + append-commit sequence exposes), and a
    replayed ``txn`` commits nothing at entry.

    This is the MERGE-shaped write at O(victim files + arrivals): the
    incremental-maintenance primitive under ``operators.indexsync``
    (one curation wave = one serving-index commit), and the general
    upsert wave for any keyed table (delete the keys' old images,
    append the new ones). ``merge_table`` by contrast recomputes and
    rewrites the whole snapshot. A wave with no matching victims and
    no arrivals still publishes when ``txn``/``properties`` are given
    (the watermark-only commit an empty sync wave needs); with neither
    given this degrades to exactly ``delete_rows``.

    Constraints shared with the rewrite path: ``append_df`` must match
    the table schema exactly (strict — evolution goes through
    ``write_table(schema_mode='merge')``), and stats-bearing callers
    serialize writers per table (the standing single-maintainer
    contract). Returns the manifest dict with ``files_rewritten`` /
    ``files_untouched`` / ``rows_affected`` (deleted rows), or None
    for a replayed txn / a no-op wave without txn or appends."""
    return _rewrite_rows(
        spark,
        path,
        delete_where,
        tuple(delete_prune),
        lambda df, hit: df.filter(~hit),
        "apply_delta",
        stats_cols,
        properties=properties,
        append_df=append_df,
        txn=txn,
    )


def vacuum_table(spark: SparkSession, path: str, keep_last: int = 1) -> dict:
    """Reclaim storage: delete data files referenced ONLY by manifests
    older than the last ``keep_last`` versions, then drop those
    manifests. This is the explicit, operator-invoked destructive step
    — the commit path itself never deletes, which is what makes
    concurrent readers safe. Run it with a grace period longer than the
    longest-running reader (same discipline as any table format)."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    root = path.rstrip("/")
    versions = list_manifests(spark, root)
    if not versions:
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    keep_versions = versions[-keep_last:]
    drop_versions = versions[:-keep_last]
    live: set[str] = set()
    for v in keep_versions:
        live.update(read_manifest(spark, root, v)["files"])
    dead: set[str] = set()
    for v in drop_versions:
        dead.update(read_manifest(spark, root, v)["files"])
    dead -= live

    lp = _local_path(root)
    if lp is not None:
        for rel in sorted(dead):
            try:
                os.remove(f"{lp}/{rel}")
            except FileNotFoundError:
                pass
        for v in drop_versions:
            try:
                os.remove(_manifest_path(lp, v))
            except FileNotFoundError:
                pass
        # drop now-empty commit directories (pure cosmetics; readers
        # never list data/)
        ddir = f"{lp}/data"
        if os.path.isdir(ddir):
            for n in os.listdir(ddir):
                sub = f"{ddir}/{n}"
                if os.path.isdir(sub) and not os.listdir(sub):
                    os.rmdir(sub)
    else:
        fs, _, jvm = _fs(spark, root)
        for rel in sorted(dead):
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}"), False)
        for v in drop_versions:
            fs.delete(jvm.org.apache.hadoop.fs.Path(_manifest_path(root, v)), False)
        # drop now-empty commit directories (pure cosmetics; readers never
        # list data/)
        data_dir = jvm.org.apache.hadoop.fs.Path(f"{root}/data")
        if fs.exists(data_dir):
            for st in fs.listStatus(data_dir):
                if st.isDirectory() and not fs.listStatus(st.getPath()):
                    fs.delete(st.getPath(), False)
    return {
        "deleted_files": len(dead),
        "deleted_manifests": len(drop_versions),
        "kept_versions": keep_versions,
    }


def table_diff(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: tuple[str, ...],
    include_preimage: bool = False,
) -> DataFrame:
    """Row-level change feed between two committed snapshots: every key
    classified ``insert`` / ``delete`` / ``update`` (unchanged rows are
    excluded). Emits the NEW row for inserts/updates and the OLD row
    for deletes, plus ``change_type`` — the CDC read that turns the
    version history into an incremental downstream feed (a consumer
    that processed ``from_version`` catches up without rescanning the
    whole table).

    ``include_preimage=True`` additionally emits the OLD row of every
    update as ``update_preimage`` (the new row keeps type ``update``)
    — what incremental aggregate maintenance needs to retract the old
    contribution before adding the new one.

    One full-outer key join between the two snapshots; non-key columns
    compare by a null-safe xxhash64 so the plan never widens to a
    column-by-column comparison chain. Because manifests pin explicit
    file lists, both sides read consistent data even while newer
    commits land."""
    if not key_cols:
        raise ValueError("table_diff needs at least one key column")
    old = snapshot(spark, path, from_version)
    new = snapshot(spark, path, to_version)
    if old.columns != new.columns:
        raise ValueError(
            f"schema changed between v{from_version} and v{to_version}: "
            f"{old.columns} vs {new.columns}"
        )
    return _classify_changes(old, new, tuple(key_cols), include_preimage)


def _classify_changes(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...],
    include_preimage: bool,
) -> DataFrame:
    """Shared change classifier behind ``table_diff`` (whole snapshots)
    and ``row_changes`` (changed files only): full-outer key join, rows
    whose non-key fingerprints match are excluded as unchanged."""
    data_cols = [c for c in old.columns if c not in key_cols]
    fp = (
        F.xxhash64(*[F.col(c) for c in data_cols])
        if data_cols
        else F.lit(0).cast("bigint")
    )
    o = old.select(
        *[F.col(c).alias(f"_o_{c}") for c in old.columns], fp.alias("_o_fp")
    )
    n = new.select(
        *[F.col(c).alias(f"_n_{c}") for c in new.columns], fp.alias("_n_fp")
    )
    cond = None
    for k in key_cols:
        c = o[f"_o_{k}"].eqNullSafe(n[f"_n_{k}"])
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")
    is_insert = o[f"_o_{key_cols[0]}"].isNull() & n[f"_n_{key_cols[0]}"].isNotNull()
    is_delete = n[f"_n_{key_cols[0]}"].isNull() & o[f"_o_{key_cols[0]}"].isNotNull()
    # keys present on both sides with equal fingerprints are unchanged
    is_update = (~is_insert) & (~is_delete) & (F.col("_o_fp") != F.col("_n_fp"))
    out_cols = [
        F.when(is_delete, o[f"_o_{c}"]).otherwise(n[f"_n_{c}"]).alias(c)
        for c in old.columns
    ]
    change = (
        F.when(is_insert, F.lit("insert"))
        .when(is_delete, F.lit("delete"))
        .when(is_update, F.lit("update"))
    )
    feed = j.select(*out_cols, change.alias("change_type")).filter(
        F.col("change_type").isNotNull()
    )
    if not include_preimage:
        return feed
    pre = (
        j.filter(is_update)
        .select(
            *[o[f"_o_{c}"].alias(c) for c in old.columns],
            F.lit("update_preimage").alias("change_type"),
        )
    )
    return feed.unionByName(pre)


def restore_table(spark: SparkSession, path: str, version: int) -> dict:
    """Roll the table back to ``version`` as a NEW commit (metadata
    only — the old snapshot's files are re-referenced, nothing is
    copied or rewritten, and history is preserved: the bad commits stay
    inspectable and the restore itself is one more version, exactly the
    Delta RESTORE semantics). The restored manifest carries the old
    version's schema/stats/blooms/partition layout verbatim and the
    HEAD's txn watermarks (a restore must not re-open exactly-once
    windows — replayed streaming batches stay rejected).

    Requires the target version's files to still exist — run restores
    before ``vacuum_table`` reclaims them (vacuum keeps the last N
    versions; a restore older than that raises here with a clear
    message instead of a mid-scan file-not-found)."""
    root = path.rstrip("/")
    target = read_manifest(spark, root, version)
    head = latest_manifest(spark, root)
    assert head is not None
    lp = _local_path(root)
    if lp is not None:
        missing = [
            rel
            for rel in target["files"]
            if not os.path.exists(f"{lp}/{rel}")
        ]
    else:
        fs, _, jvm = _fs(spark, root)
        missing = [
            rel
            for rel in target["files"]
            if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}"))
        ]
    if missing:
        raise FileNotFoundError(
            f"cannot restore {path} to v{version}: {len(missing)} of its "
            f"data files were vacuumed (first: {missing[0]!r})"
        )

    def build(h: dict | None) -> dict:
        if h is None or h["version"] != head["version"]:
            raise RuntimeError(
                f"concurrent commit during restore at {path} — re-run"
            )
        return {
            "files": target["files"],
            "schema": target["schema"],
            "txn": _merged_txn(h, None),
            # `k in target`, not `target.get(k)`: falsy-but-meaningful
            # values (an empty target version's rows/stats maps) must be
            # restored verbatim, not dropped
            **{
                k: target[k]
                for k in ("stats", "rows", "bloom_meta", "blooms",
                          "partition_by", "parts", "properties")
                if k in target
            },
        }

    out = _commit(spark, path, build, "restore")
    assert out is not None
    out["restored_from"] = version
    return out


def changed_files(
    spark: SparkSession, path: str, from_version: int, to_version: int
) -> dict[str, list[str]]:
    """File-level diff between two committed snapshots:
    ``{'added': [...], 'removed': [...]}`` (table-root-relative, sorted)
    — pure manifest metadata, zero data files opened. The primitive
    under ``read_changes``; also the input a storage replicator or
    cache invalidator wants (ship exactly these files)."""
    root = path.rstrip("/")
    m_from = read_manifest(spark, root, from_version)
    m_to = read_manifest(spark, root, to_version)
    f_from, f_to = set(m_from["files"]), set(m_to["files"])
    return {
        "added": sorted(f_to - f_from),
        "removed": sorted(f_from - f_to),
    }


def read_changes(
    spark: SparkSession, path: str, from_version: int, to_version: int
) -> DataFrame:
    """The rows of every data file ADDED between ``from_version``
    (exclusive) and ``to_version`` (inclusive) — the O(new data)
    incremental read: a consumer that processed ``from_version``
    catches up by scanning ONLY the added files, never the snapshot
    (``table_diff`` by contrast full-outer-joins two whole snapshots
    to classify rows — use it when commits REWRITE files; for
    append-only histories — ``mode='append'`` writers, streaming
    micro-batch ingest — added files ARE the inserted rows, so this
    read is the exact row-level delta at file-scan cost).

    Reads with ``to_version``'s schema (an evolved append's new
    columns come back, older files' rows null-fill them). Removed
    files are NOT read — pair with ``changed_files`` when the
    consumer must also retract (a rewriting commit lists the old file
    in 'removed' and its surviving rows in 'added').

    At 100 TB this is the difference between an incremental rollup
    that scans one micro-batch's files and one that rescans the lake:
    work proportional to the delta, the same contract the reference's
    per-database reload keeps at database granularity
    (``LoadFiles.pm:56-64`` — reload touches one database, never the
    mirror). Parity gated by ``llp_manifest_cdc``: base + sum of
    changes == final snapshot, row-for-row."""
    root = path.rstrip("/")
    m_to = read_manifest(spark, root, to_version)
    added = changed_files(spark, root, from_version, to_version)["added"]
    return _read_files(spark, m_to, root, added)


def row_changes(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    key_cols: tuple[str, ...],
    include_preimage: bool = False,
) -> DataFrame:
    """``table_diff``'s change feed at ``read_changes``' cost: the
    row-level insert/delete/update classification computed from the
    CHANGED FILES ONLY — O(delta), never O(table).

    Copy-on-write makes this sound: a row can only change or disappear
    if the file holding it is REWRITTEN (listed in 'removed'), and its
    new image (or its carried-forward identical self) lands in an
    'added' file — so diffing removed-file rows against added-file
    rows classifies exactly the rows ``table_diff`` would, while every
    untouched file's rows (identical on both sides by construction)
    are never read. A compaction commit removes and re-adds the same
    rows → all fingerprint-equal → empty feed; ``drop_partition``
    removes files without adding → deletes; an append adds without
    removing → inserts. Gated row-identical to ``table_diff`` across
    all of these in tests.

    Same output contract as ``table_diff``: every changed key emits
    the NEW row for insert/update and the OLD row for delete, plus
    ``change_type``; ``include_preimage=True`` adds each update's old
    row as ``update_preimage``. Same assumptions: ``key_cols`` are
    unique per snapshot, and ``from_version``'s files must still be on
    disk (readable until ``vacuum_table`` reclaims them — the same
    lifetime ``snapshot(from_version)`` has).

    At 100 TB this is THE incremental-consumer read: an index-sync or
    downstream-rollup wave pays for the files one curation commit
    touched, not for two full snapshot scans joined key-by-key.
    Reference analogue: the loader reloads one database, never the
    mirror (``LoadFiles.pm:56-64``)."""
    if not key_cols:
        raise ValueError("row_changes needs at least one key column")
    root = path.rstrip("/")
    m_from = read_manifest(spark, root, from_version)
    m_to = read_manifest(spark, root, to_version)
    if m_from["schema"] != m_to["schema"]:
        raise ValueError(
            f"schema changed between v{from_version} and v{to_version} — "
            "use table_diff (whole-snapshot compare) across schema evolution"
        )
    cf = changed_files(spark, root, from_version, to_version)
    old = _read_files(spark, m_from, root, cf["removed"])
    new = _read_files(spark, m_to, root, cf["added"])
    return _classify_changes(old, new, tuple(key_cols), include_preimage)


def table_history(spark: SparkSession, path: str) -> DataFrame:
    """One row per committed version: (version, operation, n_files) —
    the audit trail the reference keeps as per-database job rows
    (``JobFactory.pm`` analysis accounting), here per snapshot."""
    root = path.rstrip("/")
    rows = [
        (m["version"], m["operation"], len(m["files"]))
        for m in (read_manifest(spark, root, v) for v in list_manifests(spark, root))
    ]
    return spark.createDataFrame(
        rows, "version bigint, operation string, n_files bigint"
    ).orderBy(F.col("version"))


def orphan_files(spark: SparkSession, path: str) -> list[str]:
    """Data files under ``data/`` that NO manifest (any retained
    version) references — debris from writers that crashed or errored
    between staging and commit. The commit protocol makes these
    inevitable by design (data is fully written BEFORE the manifest
    publishes, so an abort strands its staged files) and harmless to
    correctness (readers only ever open manifest-listed files); this
    names them so ``remove_orphans`` can reclaim the storage. Returns
    table-root-relative paths."""
    root = path.rstrip("/")
    if not list_manifests(spark, root):
        raise FileNotFoundError(f"no manifest at {path} — not a committed table")
    referenced: set[str] = set()
    for v in list_manifests(spark, root):
        referenced.update(read_manifest(spark, root, v)["files"])
    lp = _local_path(root)
    found: list[str] = []
    if lp is not None:
        ddir = f"{lp}/data"
        commits = (
            sorted(n for n in os.listdir(ddir) if os.path.isdir(f"{ddir}/{n}"))
            if os.path.isdir(ddir)
            else []
        )
    else:
        fs, _, jvm = _fs(spark, root)
        data_dir = jvm.org.apache.hadoop.fs.Path(f"{root}/data")
        commits = (
            [
                st.getPath().getName()
                for st in fs.listStatus(data_dir)
                if st.isDirectory()
            ]
            if fs.exists(data_dir)
            else []
        )
    for cname in commits:
        # recursive: partitioned commits nest hive col=value dirs
        for n in _list_data_files_recursive(spark, f"{root}/data/{cname}"):
            rel = f"data/{cname}/{n}"
            if rel not in referenced:
                found.append(rel)
    return sorted(found)


def remove_orphans(
    spark: SparkSession, path: str, grace_ms: int = 24 * 3600 * 1000
) -> dict:
    """Delete orphaned staged files older than ``grace_ms``
    (modification time) — the Iceberg remove-orphan-files discipline.
    The grace period protects writers CURRENTLY between staging and
    commit: their files look orphaned until the manifest publishes, so
    never run with a grace shorter than the longest plausible
    stage-to-commit window (default 24h; the staging itself is one
    Spark write, but a stalled executor or slow FS can stretch it).
    Returns ``{'deleted': n, 'skipped_recent': m}``."""
    root = path.rstrip("/")
    now_ms = _now_epoch_ms(spark)
    lp = _local_path(root)
    deleted = skipped = 0
    if lp is not None:
        for rel in orphan_files(spark, root):
            p = f"{lp}/{rel}"
            if now_ms - int(os.path.getmtime(p) * 1000) < grace_ms:
                skipped += 1
                continue
            os.remove(p)
            deleted += 1
        return {"deleted": deleted, "skipped_recent": skipped}
    fs, _, jvm = _fs(spark, root)
    for rel in orphan_files(spark, root):
        p = jvm.org.apache.hadoop.fs.Path(f"{root}/{rel}")
        if now_ms - fs.getFileStatus(p).getModificationTime() < grace_ms:
            skipped += 1
            continue
        fs.delete(p, False)
        deleted += 1
    return {"deleted": deleted, "skipped_recent": skipped}


def replicate_table(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    to_version: int | None = None,
) -> dict:
    """Incrementally replicate a manifest table to another location —
    the DR / multi-region / cold-storage read replica.

    Because every manifest pins an explicit ROOT-RELATIVE file list,
    replication is exactly two steps: (1) copy the data files the
    target version references that the replica does not already hold
    (the delta between the source manifest and the union of manifests
    already replicated — pure metadata, no listing of the replica's
    data tree), then (2) publish the source manifest VERBATIM at the
    replica (atomic tmp+rename, data-before-manifest as in `_commit`).
    The replica is byte-equivalent for everything the manifest
    carries: snapshot rows, schema, partition layout, per-file stats
    and blooms (``scan_table`` skips files at the replica exactly as
    at the primary), properties (an ANN index's centroids replicate
    with its cells), and change feeds between replicated versions.

    Each call ships one version's delta; call per interesting version
    (or just per head) — the replica's history is the SPARSE set of
    replicated versions, and a version already present no-ops, so a
    crashed replication re-runs safely (file copies are idempotent
    overwrites inside content-addressed commit dirs; the manifest
    publishes last). A replica that has committed its OWN writes has
    diverged and is refused — replicas are read-only by contract.

    At 100 TB the manifest delta IS the replication contract: this
    driver-side loop streams each file through the FS client (fine for
    maintenance-window volumes); for bulk backfills hand
    ``changed_files`` to a parallel copy tool and let the final
    ``replicate_table`` call verify presence and publish (already-
    present files are skipped, not re-copied). Reference analogue: the
    loader's whole job is this shape — mirror a release by copying
    exactly the files a database's checksum manifest lists
    (``LoadFiles.pm`` checksum-verified rsync/FTP mirror)."""
    src = src_path.rstrip("/")
    dst = dst_path.rstrip("/")
    src_versions = list_manifests(spark, src)
    if not src_versions:
        raise ValueError(f"no manifest table at {src}")
    to_v = int(to_version if to_version is not None else src_versions[-1])
    if to_v not in src_versions:
        raise ValueError(f"source has no version {to_v} at {src}")
    dst_versions = list_manifests(spark, dst)
    extra = sorted(set(dst_versions) - set(src_versions))
    if extra or any(
        read_manifest(spark, dst, v) != read_manifest(spark, src, v)
        for v in dst_versions
    ):
        raise ValueError(
            f"replica at {dst} has diverged from {src} (own commits or "
            "mismatched manifests) — replicas are read-only"
        )
    if to_v in dst_versions:
        return {"noop": True, "version": to_v, "files_copied": 0,
                "files_present": 0}
    m = read_manifest(spark, src, to_v)
    have: set[str] = set()
    for v in dst_versions:
        have.update(read_manifest(spark, dst, v)["files"])
    need = [f for f in m["files"] if f not in have]
    lsrc, ldst = _local_path(src), _local_path(dst)
    if lsrc is not None and ldst is not None:
        import shutil

        os.makedirs(ldst, exist_ok=True)
        for rel in need:
            dst_file = f"{ldst}/{rel}"
            os.makedirs(os.path.dirname(dst_file), exist_ok=True)
            shutil.copyfile(f"{lsrc}/{rel}", dst_file)
        # publish last, atomically: write the source manifest verbatim
        tmp = f"{ldst}/_tmp-replica-{uuid.uuid4().hex}.json"
        _write_bytes(spark, tmp, _read_bytes(spark, _manifest_path(src, to_v)))
        os.rename(tmp, _manifest_path(ldst, to_v))
    else:
        fs, _, jvm = _fs(spark, dst)
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        hpath = jvm.org.apache.hadoop.fs.Path
        fs.mkdirs(hpath(dst))
        for rel in need:
            jvm.org.apache.hadoop.fs.FileUtil.copy(
                fs, hpath(f"{src}/{rel}"), fs, hpath(f"{dst}/{rel}"),
                False, True, conf,
            )
        # publish last, atomically: write the source manifest verbatim
        tmp = f"{dst}/_tmp-replica-{uuid.uuid4().hex}.json"
        _write_bytes(spark, tmp, _read_bytes(spark, _manifest_path(src, to_v)))
        if not fs.rename(hpath(tmp), hpath(_manifest_path(dst, to_v))):
            fs.delete(hpath(tmp), False)
            raise RuntimeError(
                f"could not publish replica manifest v{to_v} at {dst}"
            )
    return {
        "noop": False,
        "version": to_v,
        "files_copied": len(need),
        "files_present": len(m["files"]) - len(need),
    }


def _now_epoch_ms(spark: SparkSession) -> int:
    return spark._jvm.java.lang.System.currentTimeMillis()
