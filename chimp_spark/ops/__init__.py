from . import ann_index, dedup, similarity, text  # noqa: F401
