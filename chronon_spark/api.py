"""Declarative config layer: GroupBy / Aggregation / Window / Join dataclasses.

Mirrors the reference's Thrift API surface (reference: thrift/api.thrift:238-440)
as plain Python dataclasses. Output-column naming follows the reference's
``{input}_{op}[{k}][_{window}][_by_{bucket}]`` convention
(reference: api/src/main/scala/ai/chronon/api/Extensions.scala:263-277).

Boundary semantics: the engine default is **strict** ``event_ts < query_ts``
(zero temporal leakage, per BASELINE.json north_rule). The reference's batch
path is inclusive ``<=`` (SawtoothAggregator.scala:129-137); set
``GroupBy.include_equal=True`` to reproduce that.
"""

from __future__ import annotations

import enum
import re
from dataclasses import dataclass, field


class Op(str, enum.Enum):
    """Aggregation operators (reference: thrift/api.thrift:198-230)."""

    COUNT = "count"
    SUM = "sum"
    AVERAGE = "average"
    MIN = "min"
    MAX = "max"
    VARIANCE = "variance"  # population variance (m2 / n)
    SKEW = "skew"  # population skewness sqrt(n)*m3/m2^1.5, null if n<3
    KURTOSIS = "kurtosis"  # excess kurtosis n*m4/m2^2 - 3, null if n<4
    FIRST = "first"  # earliest-ts non-null value
    LAST = "last"  # latest-ts non-null value
    FIRST_K = "first_k"  # k earliest, time-ascending
    LAST_K = "last_k"  # k latest, time-descending (most recent first)
    TOP_K = "top_k"  # k largest by value, descending
    BOTTOM_K = "bottom_k"  # k smallest by value, ascending
    HISTOGRAM = "histogram"  # map<value, count>
    UNIQUE_COUNT = "unique_count"  # exact distinct
    APPROX_UNIQUE_COUNT = "approx_unique_count"  # sketch on the JVM path; exact in kernels
    APPROX_PERCENTILE = "approx_percentile"  # percentiles arg; exact interpolation in kernels
    APPROX_FREQUENT_K = "approx_frequent_k"  # k most frequent values -> map (exact at kernel scale)
    # NO_FALSE_POSITIVES variant (reference row/ColumnAggregator.scala:266-278,
    # ItemsSketch ErrorType.NO_FALSE_POSITIVES): only items whose frequency
    # LOWER bound clears the sketch error are returned. The exact kernel has
    # zero error, so both variants coincide there (as in the reference before
    # the sketch purges); the scale path keeps the guarantee flag.
    APPROX_HEAVY_HITTERS_K = "approx_heavy_hitters_k"
    UNIQUE_TOP_K = "unique_top_k"  # k largest DISTINCT values, descending


# ops whose output is a list
_LIST_OPS = {Op.FIRST_K, Op.LAST_K, Op.TOP_K, Op.BOTTOM_K, Op.UNIQUE_TOP_K}
# ops that take k
_K_OPS = {Op.FIRST_K, Op.LAST_K, Op.TOP_K, Op.BOTTOM_K, Op.UNIQUE_TOP_K, Op.APPROX_FREQUENT_K, Op.APPROX_HEAVY_HITTERS_K}
# ops that require a numeric input
NUMERIC_OPS = {
    Op.SUM,
    Op.AVERAGE,
    Op.VARIANCE,
    Op.SKEW,
    Op.KURTOSIS,
    Op.APPROX_PERCENTILE,
}

_WINDOW_RE = re.compile(r"^(\d+)\s*(ms|s|m|h|d)$")
_UNIT_MS = {"ms": 1, "s": 1000, "m": 60_000, "h": 3_600_000, "d": 86_400_000}


@dataclass(frozen=True)
class Window:
    """A trailing time window, e.g. Window('7d'). None length = unbounded.

    Reference: api/src/main/scala/ai/chronon/api/Extensions.scala:72-101.
    """

    spec: str | None = None  # "7d", "2h", "30m", "90s", None = lifetime

    @property
    def millis(self) -> int | None:
        if self.spec is None:
            return None
        m = _WINDOW_RE.match(self.spec.strip())
        if not m:
            raise ValueError(f"bad window spec {self.spec!r}; want e.g. '7d', '2h', '30m'")
        return int(m.group(1)) * _UNIT_MS[m.group(2)]

    @property
    def suffix(self) -> str:
        return "" if self.spec is None else f"_{self.spec.strip().replace(' ', '')}"


UNBOUNDED = Window(None)


@dataclass(frozen=True)
class Aggregation:
    """One (input column, operation) with windows × buckets auto-explode.

    Reference: thrift/api.thrift:238-264; unpacking semantics
    api/src/main/scala/ai/chronon/api/Extensions.scala:283-305.
    """

    input_column: str
    op: Op
    windows: tuple[Window, ...] = (UNBOUNDED,)
    buckets: tuple[str, ...] = ()
    k: int | None = None  # for *_K ops
    percentiles: tuple[float, ...] = (0.5,)  # for APPROX_PERCENTILE

    def __post_init__(self) -> None:
        if self.op in _K_OPS and not self.k:
            raise ValueError(f"{self.op} requires k")
        ws = tuple(Window(w) if (isinstance(w, str) or w is None) else w for w in self.windows)
        object.__setattr__(self, "windows", ws or (UNBOUNDED,))
        object.__setattr__(self, "buckets", tuple(self.buckets))

    def parts(self) -> list["AggregationPart"]:
        out = []
        for w in self.windows:
            for b in self.buckets or (None,):
                out.append(AggregationPart(self.input_column, self.op, w, b, self.k, self.percentiles))
        return out


@dataclass(frozen=True)
class AggregationPart:
    """One output column (reference: thrift/api.thrift:267-273)."""

    input_column: str
    op: Op
    window: Window
    bucket: str | None = None
    k: int | None = None
    percentiles: tuple[float, ...] = (0.5,)

    @property
    def output_name(self) -> str:
        """`{input}_{op}{k}{_window}{_by_bucket}` (Extensions.scala:263-277)."""
        op = self.op.value + (str(self.k) if self.op in _K_OPS else "")
        name = f"{self.input_column}_{op}{self.window.suffix}"
        if self.bucket:
            name += f"_by_{self.bucket}"
        return name

    @property
    def is_list_output(self) -> bool:
        return self.op in _LIST_OPS


class Accuracy(str, enum.Enum):
    """TEMPORAL = exact as-of at each query ts; SNAPSHOT = midnight-accurate.

    Reference: thrift/api.thrift:275-278.
    """

    TEMPORAL = "temporal"
    SNAPSHOT = "snapshot"


@dataclass
class GroupBy:
    """Windowed aggregation spec over an event source.

    Reference: thrift/api.thrift:366-380; spark/.../GroupBy.scala:50.

    ``time_column`` must be a timestamp (cast to int64 micros internally);
    ``tie_breakers`` give the stable secondary sort (north rule: stable turn
    ordering — (ts, turn_idx) for transcripts).
    """

    keys: list[str]
    aggregations: list[Aggregation]
    time_column: str = "ts"
    tie_breakers: list[str] = field(default_factory=list)
    accuracy: Accuracy = Accuracy.TEMPORAL
    include_equal: bool = False  # True reproduces reference batch `<=` boundary
    # post-aggregation projection over key + output columns ("*" passthrough
    # supported) — reference GroupBy.derivations (thrift/api.thrift:379,
    # projection semantics api/.../Extensions.scala:1261-1296)
    derivations: dict[str, str] | None = None
    # sawtooth mode: round window start down to hop boundaries (reference
    # Resolution.scala:38-63). None = exact window start (the default here:
    # exact is SQL-oracle-expressible and strictly more accurate).
    sawtooth: bool = False

    def parts(self) -> list[AggregationPart]:
        out: list[AggregationPart] = []
        for a in self.aggregations:
            out.extend(a.parts())
        names = [p.output_name for p in out]
        dup = {n for n in names if names.count(n) > 1}
        if dup:
            raise ValueError(f"duplicate output columns: {sorted(dup)}")
        return out

    @property
    def max_window_millis(self) -> int | None:
        """Largest bounded window, for window-rewind scan planning
        (reference: GroupBy.getIntersectedRange, GroupBy.scala:741-788)."""
        ms = [p.window.millis for p in self.parts()]
        if any(m is None for m in ms):
            return None
        return max(ms) if ms else 0


@dataclass
class JoinPart:
    """One as-of-join leg (reference: thrift/api.thrift:382-388).

    ``right_df`` is the event DataFrame this leg aggregates (the reference
    resolves it from the GroupBy's sources; we bind it directly).
    """

    group_by: GroupBy
    right_df: object = None  # pyspark DataFrame
    key_mapping: dict[str, str] | None = None  # left col -> right key
    prefix: str | None = None
    # physical as-of plan for this part: plain | tiled | sliced | skew
    # (all equivalence-tested; tiled needs sawtooth + bounded windows)
    strategy: str = "plain"

    def out_name(self, part: AggregationPart) -> str:
        return f"{self.prefix}_{part.output_name}" if self.prefix else part.output_name


@dataclass
class Join:
    """Point-in-time-correct left join (reference: thrift/api.thrift:407-440)."""

    left_time_column: str
    join_parts: list[JoinPart]
    derivations: dict[str, str] | None = None  # name -> spark SQL expr over outputs
    skew_keys: dict[str, list[str]] | None = None  # col -> excluded hot values
    # columns uniquely identifying a left record (thrift:426 `rowIds`) —
    # required by the modular per-part backfill (jobs/modular_join.py)
    row_ids: list[str] | None = None
