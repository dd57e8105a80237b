"""Small shared helpers for the ops kernels."""

from __future__ import annotations

from pyspark.sql import DataFrame


def id_ddl(sel: DataFrame) -> str:
    """DDL type string of a projection's FIRST column — used by
    mapInArrow kernels that pass the caller's id column through
    untouched, so string url keys (the north-rule pages shape) work
    exactly like bigint doc_ids."""
    return sel.schema[0].dataType.simpleString()
