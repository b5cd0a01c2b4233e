"""Metadata export: machine-readable spec + schema documents.

The reference's ``metadata-upload`` / ``metadata-export`` run modes
(repo/constants.py:18,25) ship GroupByServingInfo-style documents — the
spec, its semantic identity, and the value schemas — to the serving tier
and the catalog. The offline analogue: one JSON document per GroupBy/Join
carrying everything a fetcher, a catalog, or a code-reviewer needs to know
about an output table without running the job:

- the spec (keys, aggregations with windows/buckets/k, accuracy, derivations),
- the semantic hash (same function the sink lifecycle + modular backfill use
  for invalidation — `plans/manifest.group_by_semantic_hash`),
- the input schema it was validated against,
- the OUTPUT schema, derived without executing (aggregation output types via
  `types.part_output_type`, the analyzer's collision/compat checks re-used).

Everything is derived metadata — no data is read; safe to run in CI.
"""

from __future__ import annotations

import json
from dataclasses import asdict

from pyspark.sql import DataFrame

from chronon_spark.analyzer import analyze_group_by
from chronon_spark.api import GroupBy
from chronon_spark.plans.manifest import group_by_semantic_hash
from chronon_spark.types import part_output_type


def group_by_metadata(right: DataFrame, gb: GroupBy, name: str = "group_by") -> dict:
    """Validated metadata document for one GroupBy over its source schema.
    Raises (via the analyzer) if the spec doesn't fit the schema."""
    analyze_group_by(right, gb).raise_if_failed()
    in_types = {f.name: f.dataType for f in right.schema.fields}
    parts = gb.parts()
    out_schema = [
        {"name": p.output_name, "type": part_output_type(p, in_types[p.input_column]).simpleString()}
        for p in parts
    ]
    aggs = []
    for a in gb.aggregations:
        d = asdict(a)
        d["op"] = a.op.name
        d["windows"] = [w.spec for w in a.windows]  # Window -> spec string / null
        aggs.append(d)
    return {
        "name": name,
        "semantic_hash": group_by_semantic_hash(gb),
        "keys": list(gb.keys),
        "time_column": gb.time_column,
        "accuracy": getattr(gb.accuracy, "name", str(gb.accuracy)),
        "sawtooth": gb.sawtooth,
        "aggregations": aggs,
        "derivations": dict(gb.derivations or {}),
        "input_schema": [
            {"name": f.name, "type": f.dataType.simpleString()} for f in right.schema.fields
        ],
        "output_schema": out_schema,
    }


def export_metadata(right: DataFrame, gb: GroupBy, path: str, name: str = "group_by") -> dict:
    """Write the document as JSON; returns it."""
    doc = group_by_metadata(right, gb, name)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    return doc
