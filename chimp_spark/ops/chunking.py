"""Document chunking and sequence packing for LLM training pipelines.

``chunk_documents`` is pure Catalyst (sequence + explode + substring):
a narrow map that scales linearly with executors — no shuffle, no
Python. ``pack_sequences`` (greedy fixed-budget packing) is inherently
sequential per bin, so it runs per-partition over a DETERMINISTIC
layout (hash-of-id repartition + sort within partition): rerunning
yields the same packs, and the parallelism is the partition count.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 512,
    stride: int = 384,
    chunk_col: str = "chunk",
) -> DataFrame:
    """Split each document into character windows of ``size`` starting
    every ``stride`` characters (overlap = size - stride); the last
    window may be shorter. Window offsets are 0, stride, 2*stride, ...
    strictly below the text length, so an empty text yields no chunks
    and every non-empty text yields ceil(len/stride) chunks.

    One narrow projection: sequence -> explode -> substring. At 100 TB
    this is map-only — no shuffle — and chunk rows inherit the input
    partitioning (stable downstream layout).

    -> (id_col, chunk_id, chunk_col) with chunk_id = 0-based window
    index within the document.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    n = F.length(F.col(text_col))
    # sequence(a, b) with b < a counts DOWN in Spark — guard empty text
    offs = F.when(n > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))).otherwise(
        F.array().cast("array<int>")
    )
    e = df.select(
        F.col(id_col),
        F.col(text_col),
        F.posexplode(offs).alias("chunk_id", "__off"),
    )
    return e.select(
        id_col,
        "chunk_id",
        F.substring(F.col(text_col), F.col("__off") + 1, size).alias(chunk_col),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_tokens",
    budget: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Greedy first-fit-by-id sequence packing: assign documents to
    packs so each pack's total ``length_col`` stays <= ``budget``
    (a document longer than the budget gets its own pack — callers
    chunk those first). The classic pretraining step that turns
    variable-length documents into fixed-budget training sequences.

    Packing is sequential per bin, so it runs per PARTITION: documents
    are hash-of-id repartitioned (deterministic — a rerun reproduces
    the same layout, unlike round-robin) and sorted by id within each
    partition, then a single Arrow pass assigns pack ids. Pack ids are
    namespaced by partition (pid * 2^40 + local index) so they are
    globally unique without any cross-partition coordination — the
    op is one shuffle + a narrow map at any scale.

    -> input columns + ``pack_id`` (long), ``pack_pos`` (position of
    the doc within its pack).
    """
    from .. import _ship

    _ship.ensure(df.sparkSession)  # mapInArrow entry point: workers
    # may unpickle the kernel by module reference
    n_parts = num_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    laid = df.repartition(int(n_parts), F.xxhash64(F.col(id_col))).sortWithinPartitions(
        id_col
    )
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    # fresh StructType — StructType.add mutates in place, which would
    # also rewrite `laid`'s own schema object
    schema_out = StructType(
        list(laid.schema.fields)
        + [StructField("pack_id", LongType()), StructField("pack_pos", IntegerType())]
    )
    len_idx = laid.columns.index(length_col)

    def kernel(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = pid << 40
        pack = 0
        used = 0
        pos = 0
        started = False
        for b in it:
            lens = b.column(len_idx).to_pylist()
            pack_ids, poss = [], []
            for ln in lens:
                ln = int(ln or 0)
                if started and used + ln > budget:
                    pack += 1
                    used = 0
                    pos = 0
                started = True
                used += ln
                pack_ids.append(base + pack)
                poss.append(pos)
                pos += 1
            yield pa.RecordBatch.from_arrays(
                list(b.columns)
                + [pa.array(pack_ids, pa.int64()), pa.array(poss, pa.int32())],
                schema=pa.schema(
                    list(b.schema)
                    + [pa.field("pack_id", pa.int64()), pa.field("pack_pos", pa.int32())]
                ),
            )

    return laid.mapInArrow(kernel, schema_out)
