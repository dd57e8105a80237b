from . import ann_index, dedup, sample, similarity, text  # noqa: F401
