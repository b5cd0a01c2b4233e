"""Window → tail-hop resolution (reference: aggregator/.../windowing/Resolution.scala:38-63).

Used by the sawtooth window mode and the tiled pre-aggregation strategy:
windows >= 12d round their tail to 1d hops, >= 12h to 1h hops, else 5m hops.
"""

from __future__ import annotations

MS_5M = 5 * 60_000
MS_1H = 3_600_000
MS_12H = 12 * MS_1H
MS_1D = 24 * MS_1H
MS_12D = 12 * MS_1D

HOP_SIZES_MS = (MS_1D, MS_1H, MS_5M)


def tail_hop_millis(window_millis: int | None) -> int:
    """FiveMinuteResolution.calculateTailHop (Resolution.scala:43-48)."""
    if window_millis is None:
        return MS_1D
    if window_millis >= MS_12D:
        return MS_1D
    if window_millis >= MS_12H:
        return MS_1H
    return MS_5M


def smallest_tail_hop_millis(window_millis_list: list[int | None]) -> int:
    """Smallest hop across windows — the streaming tile size
    (reference: Resolution.scala:65-86)."""
    hops = [tail_hop_millis(w) for w in window_millis_list] or [MS_1D]
    return min(hops)
