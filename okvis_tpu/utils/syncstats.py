"""Blocking host↔device sync-point accounting.

On accelerators behind a network transport (and even direct-attached), each
blocking fetch is a round trip that gates pipeline latency — the per-frame
budget is a small integer of these. Every known blocking site in the hot
path calls bump(tag); bench/profiling code reads snapshot() deltas to verify
the per-frame dispatch budget (VERDICT r1 target: ≤2 blocking round trips
per frame in the processing loop).
"""

from __future__ import annotations

import threading
from collections import Counter

_lock = threading.Lock()
_counts: Counter = Counter()


def bump(tag: str, n: int = 1) -> None:
    with _lock:
        _counts[tag] += n


def snapshot() -> dict:
    with _lock:
        return dict(_counts)


def reset() -> None:
    with _lock:
        _counts.clear()
