"""Allocator tuning for numpy-heavy kernels.

glibc malloc serves large buffers via mmap by default; every fresh
chunk-sized numpy intermediate then pays full page-fault cost (measured
>10x the arithmetic cost in this environment). Raising the mmap
threshold and disabling trim keeps kernel buffers in the sbrk heap so
pages fault once per worker process and are recycled across chunks —
exactly the steady-state shape of a mapInPandas encode task.

Safe no-op on non-glibc platforms.
"""

from __future__ import annotations

import ctypes

_M_TRIM_THRESHOLD = -1
_M_MMAP_THRESHOLD = -3


def tune_allocator() -> bool:
    try:
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(_M_MMAP_THRESHOLD, 1 << 30)
        libc.mallopt(_M_TRIM_THRESHOLD, (1 << 31) - 1)
        return True
    except OSError:
        return False


TUNED = tune_allocator()
