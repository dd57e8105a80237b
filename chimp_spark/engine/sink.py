"""Task-side decode sinks: decoded values go straight from worker
tasks into parquet shards via pyarrow — never through Spark's
Arrow -> JVM row emit.

This is the read-side mirror of ``engine/scan.py``. The scan path
bypasses InternalRow -> Arrow on ENCODE (parquet is already columnar,
so Spark only schedules); these bypass Arrow -> JVM on DECODE. The
generic ``decode_table`` is right when decoded values feed further
Spark plan nodes (joins, aggregations, filters) — but a decode
*consumer* ("materialize this encoded table back to parquet for the
trainer") pays the JVM emit for nothing. Two shapes:

- ``decode_to_parquet(encoded_df, ...)``: input is an in-flight
  encoded DataFrame. One co-location shuffle of COMPRESSED frames,
  then tasks decode and write shards; only file metadata returns
  through Spark. Measured ~2x faster than
  ``decode_table(...).write.parquet(...)`` at sf0.1/local[32].
- ``decode_table_to_parquet(spark, root, ...)``: input is a COMMITTED
  EncodedTable. Chunk groups never span data files (each encode task's
  batches land whole in one file — manifest.commit moves files
  intact), so tasks read their files straight with pyarrow and NO
  shuffle happens at all — the exact mirror of scan.py's work-unit
  model, and the shape a 100 TB decode job runs in: every task streams
  encoded shards from the store and writes decoded shards back,
  nothing crosses the JVM but the unit list and file metadata.

Commit protocol (two-phase, task-retry safe): tasks write uniquely
named files under ``<out_dir>/_staged/`` and report them; the driver
renames exactly the files reported by SUCCESSFUL task attempts into
``out_dir`` (rename is atomic within a filesystem), deletes the
staging dir (orphans from failed/speculative attempts die there), and
writes a ``_decode_manifest.json`` (underscore-prefixed: directory
readers skip it). Same idea as Spark's v1 file committer, kept
adapter-thin; on an object store the rename step becomes a manifest
pointer swap (see engine/manifest.py).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import colocate_chunks, ddl_arrow_types, iter_decoded_groups

_MANIFEST = "_decode_manifest.json"
_META_COLS = ["run_id", "part_id", "chunk_id", "row_start", "column", "checksum", "frame"]


def _prepare_out_dir(out_dir: str, mode: str) -> str:
    if mode not in ("error", "overwrite"):
        raise ValueError(f"mode must be 'error' or 'overwrite', got {mode!r}")
    if os.path.exists(out_dir) and os.listdir(out_dir):
        if mode == "error":
            raise FileExistsError(
                f"{out_dir} exists and is non-empty; pass mode='overwrite'"
            )
        import shutil

        shutil.rmtree(out_dir)
    staged = os.path.join(out_dir, "_staged")
    os.makedirs(staged, exist_ok=True)
    return staged


class _ShardWriter:
    """One decoded parquet shard per task: buffers decoded batches to
    ``row_group_rows`` row groups, writes with pyarrow. Attempt-unique
    file name — a retried/speculative attempt writes its own file and
    only the attempt whose metadata row Spark keeps gets committed."""

    def __init__(self, staged: str, pid: int, schema: pa.Schema,
                 compression: str, row_group_rows: int):
        self.path = os.path.join(staged, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet")
        self.schema = schema
        self.compression = compression
        self.row_group_rows = row_group_rows
        self.writer = None
        self.pending: list[pa.RecordBatch] = []
        self.buffered = 0
        self.rows = 0

    def _flush(self) -> None:
        if not self.pending:
            return
        if self.writer is None:
            import pyarrow.parquet as pq

            self.writer = pq.ParquetWriter(
                self.path, self.schema, compression=self.compression
            )
        self.writer.write_table(pa.Table.from_batches(self.pending, schema=self.schema))
        self.pending = []
        self.buffered = 0

    def add(self, rb: pa.RecordBatch) -> None:
        self.pending.append(rb)
        self.buffered += rb.num_rows
        self.rows += rb.num_rows
        if self.buffered >= self.row_group_rows:
            self._flush()

    def close(self) -> tuple[str, int, int] | None:
        """(path, rows, bytes), or None if no rows were ever added."""
        self._flush()
        if self.writer is None:
            return None
        self.writer.close()
        return self.path, self.rows, os.path.getsize(self.path)


def _meta_batch(pid: int, shard: tuple[str, int, int]) -> pa.RecordBatch:
    path, rows, size = shard
    return pa.RecordBatch.from_pydict(
        {"spark_part": [pid], "path": [path], "rows": [rows], "bytes": [size]},
        schema=pa.schema(
            [("spark_part", pa.int32()), ("path", pa.string()),
             ("rows", pa.int64()), ("bytes", pa.int64())]
        ),
    )


_META_DDL = "spark_part int, path string, rows long, bytes long"


def _commit(out_dir: str, staged: str, reported: list, columns: list[str],
            ddl: str, with_row_ids: bool) -> dict:
    """Rename exactly the reported shard files into out_dir; sweep the
    staging dir (orphans from failed attempts die there); write the
    manifest last."""
    import shutil

    files: list[dict] = []
    total_rows = 0
    total_bytes = 0
    for i, r in enumerate(sorted(reported, key=lambda r: (r["spark_part"], r["path"]))):
        final = os.path.join(out_dir, f"part-{i:05d}.parquet")
        os.replace(r["path"], final)
        files.append({"file": os.path.basename(final), "rows": r["rows"], "bytes": r["bytes"]})
        total_rows += r["rows"]
        total_bytes += r["bytes"]
    shutil.rmtree(staged, ignore_errors=True)
    manifest = {
        "rows": total_rows,
        "bytes": total_bytes,
        "columns": columns,
        "ddl": ddl,
        "with_row_ids": with_row_ids,
        "files": files,
    }
    tmp = os.path.join(out_dir, f".{_MANIFEST}.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, _MANIFEST))
    return {"out_dir": out_dir, "files": len(files), "rows": total_rows, "bytes": total_bytes}


def _out_schema(columns: list[str], ddl: str, with_row_ids: bool) -> pa.Schema:
    out_types = ddl_arrow_types(ddl)
    return pa.schema(
        ([("part_id", pa.int32()), ("row_id", pa.int64())] if with_row_ids else [])
        + [(c, out_types[c]) for c in columns]
    )


def _strip_ids(rb: pa.RecordBatch, n_cols: int, schema: pa.Schema) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [rb.column(j + 2) for j in range(n_cols)], schema=schema
    )


def decode_to_parquet(
    encoded: DataFrame,
    columns: list[str],
    ddl: str,
    out_dir: str,
    verify_checksums: bool = False,
    compression: str = "snappy",
    row_group_rows: int = 1 << 20,
    mode: str = "error",
    with_row_ids: bool = True,
    colocated: bool = False,
) -> dict:
    """Decode ``columns`` of an in-flight encoded DataFrame into a
    parquet directory (see module docstring for when to prefer the
    no-shuffle ``decode_table_to_parquet``).

    ``colocated=True`` skips the co-location shuffle entirely: valid
    when ``encoded`` is the DIRECT (possibly cached) output of one
    ``encode_dataframe`` call, whose kernel emits every column's frame
    of a chunk contiguously within the task — the frames are already
    grouped. A mis-declared input fails loudly (each group checks it
    holds ALL requested columns) rather than writing wrong data.

    Output schema: ``(part_id int32, row_id int64, *columns)`` (the
    alignment identity of the encode run) unless ``with_row_ids=False``
    strips the index columns. Shard count == shuffle partition count
    of the co-location exchange (or, with ``colocated=True``, the
    encoded DataFrame's own partition count — the encode layout); each
    shard's rows are ordered by (run_id, part_id, chunk_id), i.e.
    encode order within the shard.

    Returns ``{"out_dir", "files", "rows", "bytes"}``. ``mode`` is
    ``"error"`` (refuse an existing non-empty out_dir) or
    ``"overwrite"``.
    """
    from .. import _ship

    _ship.ensure(encoded.sparkSession)
    staged = _prepare_out_dir(out_dir, mode)
    if colocated:
        sel = encoded.filter(F.col("column").isin(columns)).select(*_META_COLS)
    else:
        sel = colocate_chunks(encoded, columns)
    out_types = ddl_arrow_types(ddl)
    out_schema = _out_schema(columns, ddl, with_row_ids)

    def write_shard(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        w = _ShardWriter(staged, pid, out_schema, compression, row_group_rows)
        for rb in iter_decoded_groups(batches, columns, out_types, verify_checksums):
            w.add(rb if with_row_ids else _strip_ids(rb, len(columns), out_schema))
        shard = w.close()
        if shard is not None:
            yield _meta_batch(pid, shard)

    reported = sel.mapInArrow(write_shard, _META_DDL).collect()
    return _commit(out_dir, staged, reported, columns, ddl, with_row_ids)


def decode_files_to_parquet(
    spark: SparkSession,
    enc_files: list[str],
    columns: list[str],
    ddl: str,
    out_dir: str,
    table: str | None = None,
    verify_checksums: bool = False,
    compression: str = "snappy",
    row_group_rows: int = 1 << 20,
    mode: str = "error",
    with_row_ids: bool = True,
    num_slices: int | None = None,
) -> dict:
    """NO-SHUFFLE decode: each task reads whole encoded data files
    with pyarrow, decodes, writes a decoded shard. Valid because a
    chunk group (one encode task's per-column frames for one chunk)
    never spans data files — encode emits each group in ONE output
    batch and commit moves files intact. Rows within a file may be in
    any order: each file is sorted task-side by (run_id, part_id,
    chunk_id) before group iteration (cheap: sorting metadata columns
    of frame-level rows, ~1 row per 64 K values).

    The unit of work is the FILE (a chunk group must not be split), so
    parallelism == file count; encode jobs already write one file per
    task, which keeps the two jobs' granularities aligned.
    """
    from .. import _ship

    _ship.ensure(spark)
    staged = _prepare_out_dir(out_dir, mode)
    files = sorted(enc_files)
    if not files:
        return _commit(out_dir, staged, [], columns, ddl, with_row_ids)
    out_types = ddl_arrow_types(ddl)
    out_schema = _out_schema(columns, ddl, with_row_ids)
    n_slices = num_slices or min(len(files), spark.sparkContext.defaultParallelism)
    plan = (
        spark.createDataFrame(
            [(i, p) for i, p in enumerate(files)], "unit int, path string"
        )
        .repartitionByRange(n_slices, "unit")
        .sortWithinPartitions("unit")
    )
    col_set = list(dict.fromkeys(columns))

    def work(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import pyarrow.dataset as pads
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        w = _ShardWriter(staged, pid, out_schema, compression, row_group_rows)

        def file_batches() -> Iterator[pa.RecordBatch]:
            for b in batches:
                for i in range(b.num_rows):
                    path = b.column("path")[i].as_py()
                    flt = pads.field("column").isin(col_set)
                    if table is not None:
                        flt = flt & (pads.field("table") == table)
                    t = pads.dataset(path, format="parquet").to_table(
                        columns=_META_COLS, filter=flt
                    )
                    # group contiguity within the file regardless of
                    # how the encode interleaved its emits
                    t = t.sort_by(
                        [("run_id", "ascending"), ("part_id", "ascending"),
                         ("chunk_id", "ascending")]
                    )
                    yield from t.to_batches()

        for rb in iter_decoded_groups(file_batches(), columns, out_types, verify_checksums):
            w.add(rb if with_row_ids else _strip_ids(rb, len(columns), out_schema))
        shard = w.close()
        if shard is not None:
            yield _meta_batch(pid, shard)

    reported = plan.mapInArrow(work, _META_DDL).collect()
    return _commit(out_dir, staged, reported, columns, ddl, with_row_ids)


def decode_table_to_parquet(
    spark: SparkSession,
    root: str,
    columns: list[str],
    ddl: str,
    out_dir: str,
    table: str | None = None,
    **kwargs,
) -> dict:
    """Decode a COMMITTED EncodedTable (engine/manifest.py layout) to
    a decoded parquet directory with the no-shuffle file-unit path."""
    from .manifest import EncodedTable

    t = EncodedTable(root)
    files = [
        os.path.join(t.data_dir, e["file"])
        for e in t.manifest_entries()
        if e["part_id"] == -1 and (table is None or e["table"] == table)
    ]
    return decode_files_to_parquet(
        spark, files, columns, ddl, out_dir, table=table, **kwargs
    )
