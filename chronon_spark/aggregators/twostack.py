"""TwoStackLite: the reference's alternative sliding-window aggregator.

Reference: aggregator/src/main/scala/ai/chronon/aggregator/windowing/
TwoStackLiteAggregator.scala:27-160 + TwoStackLiteAggregationBuffer.scala —
a banker's-queue ("two stack") sliding window giving O(1) amortized
push/pop/peek of the running aggregate, used where hop tiles are overkill.
Both queries and inputs stream in ascending time order; per query the buffer
evicts entries older than the (hop-rounded when sawtooth) window tail, then
absorbs events strictly before the query timestamp.

This port keeps the reference's algorithmic shape — two stacks holding
(value, running-aggregate) pairs, flip-on-empty — for the decomposable ops
(COUNT/SUM/MIN/MAX/AVERAGE, the non-invertible min/max being the reason the
structure exists). It is a sequential per-key evaluator, deliberately: the
production path is the vectorized kernels (aggregators/kernels.py), which
the equivalence tests hold this implementation to; TwoStackLite is the
memory-lean alternative when per-key event volumes are small and windows are
few (the same trade the reference documents).
"""

from __future__ import annotations

import numpy as np

from chronon_spark.api import AggregationPart, Op
from chronon_spark.resolution import tail_hop_millis

SUPPORTED = {Op.COUNT, Op.SUM, Op.MIN, Op.MAX, Op.AVERAGE}


class _TwoStackBuffer:
    """Banker's queue of (ts, value) with a running aggregate per stack.

    push: append to the back stack, extending its running aggregate.
    pop: remove the oldest element; when the front stack is empty the back
    stack flips over (reversing order, recomputing suffix aggregates) — each
    element flips at most once, hence O(1) amortized.
    """

    __slots__ = ("merge", "front", "back", "front_agg", "back_agg")

    def __init__(self, merge):
        self.merge = merge
        self.front: list[tuple[int, float]] = []  # newest ... oldest
        self.back: list[tuple[int, float]] = []  # oldest ... newest
        self.front_agg: list[float] = []  # running agg over front suffix
        self.back_agg: list[float] = []

    def push(self, ts: int, v: float) -> None:
        self.back.append((ts, v))
        prev = self.back_agg[-1] if self.back_agg else None
        self.back_agg.append(v if prev is None else self.merge(prev, v))

    def _flip(self) -> None:
        while self.back:
            ts, v = self.back.pop()
            prev = self.front_agg[-1] if self.front_agg else None
            self.front.append((ts, v))
            self.front_agg.append(v if prev is None else self.merge(prev, v))
        self.back_agg.clear()

    def peek_oldest_ts(self) -> int | None:
        if not self.front:
            self._flip()
        return self.front[-1][0] if self.front else None

    def pop(self) -> None:
        if not self.front:
            self._flip()
        self.front.pop()
        self.front_agg.pop()

    def query(self):
        f = self.front_agg[-1] if self.front_agg else None
        b = self.back_agg[-1] if self.back_agg else None
        if f is None:
            return b
        if b is None:
            return f
        return self.merge(f, b)


_MERGES = {
    Op.COUNT: lambda a, b: a + b,
    Op.SUM: lambda a, b: a + b,
    Op.AVERAGE: lambda a, b: (a[0] + b[0], a[1] + b[1]),  # (sum, count) pair IR
    Op.MIN: min,
    Op.MAX: max,
}


def compute_parts_twostack(
    events_ts: np.ndarray,
    values_by_col: dict[str, np.ndarray],
    parts: list[AggregationPart],
    q_ts: np.ndarray,
    include_equal: bool = False,
    sawtooth: bool = False,
) -> dict[str, np.ndarray]:
    """Evaluate every part at every query timestamp with one TwoStack buffer
    per (input column, window) — the reference's one-buffer-per-unique-window
    layout. `events_ts` sorted ascending; `values_by_col[c]` aligned to it
    (NaN = null, skipped like the reference's null-skipping update)."""
    bad = [p.op for p in parts if p.op not in SUPPORTED]
    if bad:
        raise ValueError(f"twostack supports {sorted(o.value for o in SUPPORTED)}; got {bad}")
    if any(p.window.millis is None for p in parts):
        raise ValueError("twostack is a sliding-window structure; use plain running aggregates for lifetime windows")

    order = np.argsort(q_ts, kind="stable")
    qs = q_ts[order]
    buffers = []
    for p in parts:
        merge = _MERGES[p.op]
        buffers.append(_TwoStackBuffer(merge))

    results = [np.empty(len(qs), object) for _ in parts]
    ev_i = 0
    n_ev = len(events_ts)
    for qi, qt in enumerate(qs):
        # absorb events before (or at, when include_equal) the query ts
        while ev_i < n_ev and (
            events_ts[ev_i] < qt or (include_equal and events_ts[ev_i] == qt)
        ):
            ts = int(events_ts[ev_i])
            for p, buf in zip(parts, buffers):
                v = values_by_col[p.input_column][ev_i]
                if isinstance(v, float) and np.isnan(v):
                    continue
                if p.op == Op.COUNT:
                    buf.push(ts, 1)
                elif p.op == Op.AVERAGE:
                    buf.push(ts, (float(v), 1))
                else:
                    buf.push(ts, v)
            ev_i += 1
        # evict entries past each window's (hop-rounded) tail, then read
        for p, buf, res in zip(parts, buffers, results):
            w_us = p.window.millis * 1000
            tail = qt - w_us
            if sawtooth:
                hop_us = tail_hop_millis(p.window.millis) * 1000
                tail = (tail // hop_us) * hop_us
            while True:
                oldest = buf.peek_oldest_ts()
                if oldest is None or oldest >= tail:
                    break
                buf.pop()
            agg = buf.query()
            if agg is None:
                res[qi] = None
            elif p.op == Op.AVERAGE:
                res[qi] = agg[0] / agg[1]
            elif p.op == Op.COUNT:
                res[qi] = int(agg)
            else:
                res[qi] = agg
    inv = np.empty(len(qs), np.int64)
    inv[order] = np.arange(len(qs))
    return {p.output_name: res[inv] for p, res in zip(parts, results)}
