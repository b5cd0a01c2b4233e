"""Authoring DSL — the reference's Python conf surface, re-implemented.

Users of the reference write feature definitions with ``GroupBy`` /
``Aggregation`` / ``Window`` / ``Operation`` / ``EventSource`` / ``Query`` /
``Join`` / ``JoinPart`` constructors (reference signatures:
python/src/ai/chronon/group_by.py:266,480,507, source.py:8,36,72,
query.py:21,112, join.py:35,211,265) and a compiler serializes them to the
"compiled" Thrift-JSON shape the engines consume. Here the constructors emit
that compiled shape DIRECTLY (plain dicts, ``json.dumps``-stable), so a conf
authored against this module

- parses through :mod:`chronon_spark.confs` (the compiled-conf loader) with
  zero translation,
- round-trips through files exactly like the reference's canary fixtures
  (api/src/test/resources/canary/compiled/...), and
- runs with :func:`backfill_join` / :func:`run_group_by` below.

Only the *signatures* mirror the reference (that is the compatibility
contract users depend on); the implementation is original and dict-based —
no Thrift, no codegen. Execution-engine knobs the reference threads through
its orchestrator (offline_schedule, env vars, cluster conf, ...) are accepted
and recorded under ``metaData.executionInfo`` but do not affect this engine's
plans; semantic fields (sources, keys, aggregations, accuracy, derivations,
key mappings, skew keys, row ids) are all honored.
"""

from __future__ import annotations

import json
from collections import OrderedDict
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "Accuracy",
    "Aggregation",
    "Derivation",
    "EntitySource",
    "EventSource",
    "GroupBy",
    "Join",
    "JoinPart",
    "JoinSource",
    "Operation",
    "Query",
    "TimeUnit",
    "Window",
    "selects",
    "compile_conf",
    "backfill_join",
    "run_group_by",
]


class TimeUnit:
    # common.thrift:5-9 codes (wire-stable)
    HOURS = 0
    DAYS = 1
    MINUTES = 2


class Accuracy:
    # thrift/api.thrift:275-278
    TEMPORAL = 0
    SNAPSHOT = 1


def Window(length: int, time_unit: int) -> dict:
    return {"length": int(length), "timeUnit": int(time_unit)}


_UNIT_BY_SUFFIX = {"h": TimeUnit.HOURS, "d": TimeUnit.DAYS, "m": TimeUnit.MINUTES}


def _normalize_window(w) -> dict:
    """Accept Window(...) dicts or "7d"/"30h"/"5m" strings (the reference's
    windows.py normalize_window contract)."""
    if isinstance(w, dict):
        return w
    s = str(w).strip().lower()
    if not s or s[-1] not in _UNIT_BY_SUFFIX:
        raise ValueError(f"window string must end in h/d/m: {w!r}")
    return Window(int(s[:-1]), _UNIT_BY_SUFFIX[s[-1]])


class Operation:
    """Operation codes (thrift/api.thrift:198-230) plus the parameterized
    forms, which return ``(code, argMap)`` tuples exactly like the
    reference's OperationWithArgs."""

    MIN = 0
    MAX = 1
    FIRST = 2
    LAST = 3
    UNIQUE_COUNT = 4
    APPROX_UNIQUE_COUNT = 5
    COUNT = 6
    SUM = 7
    AVERAGE = 8
    VARIANCE = 9
    SKEW = 10
    KURTOSIS = 11
    APPROX_PERCENTILE = 12
    LAST_K = 13
    FIRST_K = 14
    TOP_K = 15
    BOTTOM_K = 16
    HISTOGRAM = 17
    APPROX_FREQUENT_K = 18
    APPROX_HEAVY_HITTERS_K = 19
    UNIQUE_TOP_K = 20

def _with_k(code: int) -> Callable[[int], tuple]:
    def op(k: int) -> tuple:
        return (code, {"k": str(int(k))})

    return op


# the reference exposes these as callables named exactly like the plain ops;
# the class constants for parameterized ops are REPLACED by these callables
# below (a python attribute can't be both int and callable), so the only way
# to use a parameterized op is the arg form — Aggregation() accepts either
# (code, (code, argMap)) uniformly.
APPROX_UNIQUE_COUNT_LGK = _with_k(Operation.APPROX_UNIQUE_COUNT)
FREQUENT_K = _with_k(Operation.HISTOGRAM)  # exact top-k histogram, like the reference
LAST_K = _with_k(Operation.LAST_K)
FIRST_K = _with_k(Operation.FIRST_K)
TOP_K = _with_k(Operation.TOP_K)
BOTTOM_K = _with_k(Operation.BOTTOM_K)
UNIQUE_TOP_K = _with_k(Operation.UNIQUE_TOP_K)
APPROX_FREQUENT_K = _with_k(Operation.APPROX_FREQUENT_K)
APPROX_HEAVY_HITTERS_K = _with_k(Operation.APPROX_HEAVY_HITTERS_K)


_APPROX_PERCENTILE_CODE = Operation.APPROX_PERCENTILE  # before the staticmethod overwrite below


def APPROX_PERCENTILE(percentiles: Sequence[float], k: int = 128) -> tuple:
    return (
        _APPROX_PERCENTILE_CODE,
        {"percentiles": json.dumps(list(percentiles)), "k": str(int(k))},
    )


# attach the callable forms to Operation so `Operation.LAST_K(2)` works like
# the reference. NOTE: these assignments REPLACE the bare int constants for
# the ten parameterized ops — `Operation.LAST_K` is the callable, not a code
# (deliberate: a parameterized op without its argMap is never a valid conf,
# so the bare-code form must not be constructible). The un-parameterized
# constants above (SUM, COUNT, ...) remain plain codes.
Operation.APPROX_UNIQUE_COUNT_LGK = staticmethod(APPROX_UNIQUE_COUNT_LGK)  # type: ignore[assignment]
Operation.FREQUENT_K = staticmethod(FREQUENT_K)  # type: ignore[assignment]
Operation.LAST_K = staticmethod(LAST_K)  # type: ignore[assignment]
Operation.FIRST_K = staticmethod(FIRST_K)  # type: ignore[assignment]
Operation.TOP_K = staticmethod(TOP_K)  # type: ignore[assignment]
Operation.BOTTOM_K = staticmethod(BOTTOM_K)  # type: ignore[assignment]
Operation.UNIQUE_TOP_K = staticmethod(UNIQUE_TOP_K)  # type: ignore[assignment]
Operation.APPROX_FREQUENT_K = staticmethod(APPROX_FREQUENT_K)  # type: ignore[assignment]
Operation.APPROX_HEAVY_HITTERS_K = staticmethod(APPROX_HEAVY_HITTERS_K)  # type: ignore[assignment]
Operation.APPROX_PERCENTILE = staticmethod(APPROX_PERCENTILE)  # type: ignore[assignment]


def selects(*args: str, **kwargs: str) -> dict:
    """``selects("a", b="expr")`` -> ``{"a": "a", "b": "expr"}`` (ordered)."""
    out = OrderedDict()
    for a in args:
        out[a] = a
    out.update(kwargs)
    return dict(out)


def Query(
    selects: dict | None = None,
    wheres: list[str] | None = None,
    start_partition: str | None = None,
    end_partition: str | None = None,
    time_column: str | None = None,
    setups: list[str] | None = None,
    mutation_time_column: str | None = None,
    reversal_column: str | None = None,
    partition_column: str | None = None,
) -> dict:
    q: dict = {}
    if selects is not None:
        q["selects"] = dict(selects)
    if wheres:
        q["wheres"] = list(wheres)
    if start_partition:
        q["startPartition"] = start_partition
    if end_partition:
        q["endPartition"] = end_partition
    if time_column:
        q["timeColumn"] = time_column
    if setups:
        q["setups"] = list(setups)
    if mutation_time_column:
        q["mutationTimeColumn"] = mutation_time_column
    if reversal_column:
        q["reversalColumn"] = reversal_column
    if partition_column:
        q["partitionColumn"] = partition_column
    return q


def EventSource(
    table: str,
    query: dict | None = None,
    topic: str | None = None,
    is_cumulative: bool | None = None,
) -> dict:
    ev: dict = {"table": table, "query": query or {}}
    if topic:
        ev["topic"] = topic
    if is_cumulative is not None:
        ev["isCumulative"] = bool(is_cumulative)
    return {"events": ev}


def EntitySource(
    snapshot_table: str,
    query: dict | None = None,
    mutation_table: str | None = None,
    mutation_topic: str | None = None,
) -> dict:
    en: dict = {"snapshotTable": snapshot_table, "query": query or {}}
    if mutation_table:
        en["mutationTable"] = mutation_table
    if mutation_topic:
        en["mutationTopic"] = mutation_topic
    return {"entities": en}


def JoinSource(join: dict, query: dict | None = None) -> dict:
    return {"joinSource": {"join": join, "query": query or {}}}


def Aggregation(
    input_column: str | None = None,
    operation=None,
    windows: Sequence | None = None,
    buckets: Sequence[str] | None = None,
    tags: dict | None = None,
) -> dict:
    op = operation if operation is not None else Operation.LAST
    arg_map: dict = {}
    if isinstance(op, tuple):
        op, arg_map = op
    agg: dict = {"inputColumn": input_column, "operation": int(op)}
    if arg_map:
        agg["argMap"] = {k: str(v) for k, v in arg_map.items()}
    if windows:
        agg["windows"] = [_normalize_window(w) for w in windows]
    if buckets:
        agg["buckets"] = list(buckets)
    if tags:
        agg["tags"] = dict(tags)
    return agg


def Derivation(name: str, expression: str) -> dict:
    return {"name": name, "expression": expression}


# the reference DSL's kwargs surface, split by where each lands. A closed
# set: accepting arbitrary names here silently swallowed typos of SEMANTIC
# parameters (e.g. `acuracy=1` compiling with TEMPORAL accuracy) — the same
# hazard jobs/backfill.parse_gb rejects loudly.
#
# Execution-info kwargs → metaData.executionInfo (reference group_by.py:
# 493-499 / join.py:283-292 route these into common.ExecutionInfo):
_EXECUTION_KEYS = frozenset(
    {
        "offline_schedule",
        "online_schedule",
        "conf",
        "env_vars",
        "step_days",
        "historical_backfill",
        "disable_historical_backfill",  # GroupBy spelling (group_by.py:499,704)
        "cluster_conf",
        "enable_stats_compute",
        "modular_execution",
    }
)
# Meta-level kwargs → top-level metaData fields (join.py:479-489 MetaData(...)):
_META_KEYS = {
    "output_namespace": "outputNamespace",
    "table_properties": "tableProperties",
    "sample_percent": "samplePercent",
    "check_consistency": "consistencyCheck",
    "consistency_sample_percent": "consistencySamplePercent",
}
_EXEC_FIELD = {
    "offline_schedule": "offlineSchedule",
    "online_schedule": "onlineSchedule",
    "conf": "conf",
    "env_vars": "env",
    "step_days": "stepDays",
    "historical_backfill": "historicalBackfill",
    "disable_historical_backfill": "historicalBackfill",
    "cluster_conf": "clusterConf",
    "enable_stats_compute": "enableStatsCompute",
}


def _meta(name: str | None, version, online, production, **execution) -> dict:
    unknown = set(execution) - _EXECUTION_KEYS - set(_META_KEYS)
    if unknown:
        raise TypeError(
            f"unknown keyword(s) {sorted(unknown)}; accepted kwargs are "
            f"{sorted(_EXECUTION_KEYS | set(_META_KEYS))} — semantic parameters "
            f"must be spelled exactly"
        )
    md: dict = {"name": name or "<unnamed>"}
    if version is not None:
        md["version"] = version
    if online:
        md["online"] = True
    if production:
        md["production"] = True
    for k, field in _META_KEYS.items():
        if execution.get(k) is not None:
            md[field] = execution[k]
    # online_schedule validation + defaulting mirrors join.py:446-457
    osched = execution.get("online_schedule")
    if osched is not None and osched != "@never" and not online:
        raise ValueError("online_schedule cannot be set when online=False")
    if osched == "@never":
        execution["online_schedule"] = None
    elif online and osched is None:
        execution["online_schedule"] = "@daily"
    # modular_execution folds into conf.common (join.py:459-466)
    if execution.get("modular_execution"):
        conf = dict(execution.get("conf") or {})
        common = dict(conf.get("common") or {})
        common["modular_execution"] = "true"
        conf["common"] = common
        execution["conf"] = conf
    # False passes through: the reference emits explicitly-passed False
    # (join.py:469-477 — historical_backfill=False must compile to
    # historicalBackfill=false, not to an absent key a consumer defaults on)
    exec_info = {
        _EXEC_FIELD[k]: v
        for k, v in execution.items()
        if k in _EXEC_FIELD and v is not None
    }
    if exec_info:
        md["executionInfo"] = exec_info
    return md


def GroupBy(
    sources,
    keys: list[str],
    aggregations: list[dict] | None,
    version: int | None = None,
    derivations: list[dict] | None = None,
    accuracy: int | None = None,
    online: bool = False,
    production: bool = False,
    name: str | None = None,
    tags: dict | None = None,
    **execution,
) -> dict:
    if isinstance(sources, dict):
        sources = [sources]
    gb: dict = {
        "metaData": _meta(name, version, online, production, **execution),
        "sources": list(sources),
        "keyColumns": list(keys),
        "aggregations": list(aggregations or []),
    }
    if accuracy is not None:
        gb["accuracy"] = int(accuracy)
    if derivations:
        gb["derivations"] = list(derivations)
    if tags:
        gb["metaData"]["tags"] = dict(tags)
    return gb


def JoinPart(
    group_by: dict,
    key_mapping: dict[str, str] | None = None,
    prefix: str | None = None,
    tags: dict | None = None,
) -> dict:
    jp: dict = {"groupBy": group_by}
    if key_mapping:
        jp["keyMapping"] = dict(key_mapping)
    if prefix:
        jp["prefix"] = prefix
    if tags:
        jp["tags"] = dict(tags)
    return jp


def BootstrapPart(table: str, query: dict | None = None, key_columns: list[str] | None = None) -> dict:
    """Reference api.BootstrapPart (join.py:271): a pre-computed table whose
    columns pre-empt recomputation for covered rows."""
    bp: dict = {"table": table}
    if query:
        bp["query"] = query
    if key_columns:
        bp["keyColumns"] = list(key_columns)
    return bp


def Join(
    left: dict,
    right_parts: list[dict],
    row_ids: str | list[str] | None = None,
    version: int | None = None,
    online_external_parts: list[dict] | None = None,
    bootstrap_parts: list[dict] | None = None,
    bootstrap_from_log: bool = False,
    skew_keys: dict[str, list[str]] | None = None,
    derivations: list[dict] | None = None,
    online: bool = False,
    production: bool = False,
    use_long_names: bool = False,
    name: str | None = None,
    **execution,
) -> dict:
    if bootstrap_from_log:
        # join.py:433-443: appends the templated logged-table bootstrap part
        if not (online and float(execution.get("sample_percent", 100.0) or 0) > 0):
            raise ValueError(
                "bootstrap_from_log requires online=True with sample_percent > 0"
            )
        bootstrap_parts = (bootstrap_parts or []) + [{"table": "{{ logged_table }}"}]
    j: dict = {
        "metaData": _meta(name, version, online, production, **execution),
        "left": left,
        "joinParts": list(right_parts),
    }
    if row_ids:
        j["rowIds"] = [row_ids] if isinstance(row_ids, str) else list(row_ids)
    if online_external_parts:
        j["onlineExternalParts"] = list(online_external_parts)
    if bootstrap_parts:
        j["bootstrapParts"] = list(bootstrap_parts)
    if skew_keys:
        j["skewKeys"] = {k: list(v) for k, v in skew_keys.items()}
    if derivations:
        j["derivations"] = list(derivations)
    if use_long_names:
        j["useLongNames"] = True
    return j


# ---------------------------------------------------------------- execution


def compile_conf(obj: dict, path: str | None = None) -> str:
    """Serialize a DSL object to compiled-conf JSON (what the reference's
    ``zipline compile`` emits); optionally write it to ``path``."""
    s = json.dumps(obj, indent=2, sort_keys=False)
    if path is not None:
        with open(path, "w") as f:
            f.write(s + "\n")
    return s


def backfill_join(
    spark: SparkSession,
    join: dict,
    resolve: Callable[[str], DataFrame] | dict[str, DataFrame],
) -> DataFrame:
    """Run the PITC backfill for a DSL-authored Join directly (no file
    round-trip): parse through the compiled-conf loader, bind tables through
    ``resolve``, run :func:`operators.asof_join.compute_join`."""
    from chronon_spark.confs import parse_join
    from chronon_spark.operators.asof_join import compute_join

    fn = resolve if callable(resolve) else (lambda t: resolve[t])
    left_df, api_join = parse_join(join).bind(fn)
    return compute_join(left_df, api_join)


def run_group_by(
    spark: SparkSession,
    group_by: dict,
    resolve: Callable[[str], DataFrame] | dict[str, DataFrame],
) -> DataFrame:
    """Materialize a DSL-authored GroupBy's rendered + unioned source — the
    input frame downstream operators (snapshot agg, upload, streaming)
    consume. Aggregation itself happens in the join/upload jobs."""
    from chronon_spark.confs import parse_group_by

    fn = resolve if callable(resolve) else (lambda t: resolve[t])
    return parse_group_by(group_by).bind(fn)
