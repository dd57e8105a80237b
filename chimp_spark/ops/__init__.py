from . import (  # noqa: F401
    ann_index,
    chunking,
    decontam,
    dedup,
    pipeline,
    quantize,
    sample,
    similarity,
    text,
)
