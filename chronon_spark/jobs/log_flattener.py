"""Log flattening: schema-evolving key/value logs → one flat, typed table.

Reference analogue: `spark/.../LogFlattenerJob.scala` — the fetcher writes
request/response logs as serialized key/value payloads tagged with a schema
hash; the flattener job reads the schema registry, decodes each row with ITS
schema, and lands a flat table whose columns are the UNION of every schema
version's fields (absent fields null). The reference decodes Base64 Avro
(codec out of scope here, SURVEY.md §8); we take JSON payloads, which changes
only the decode call, not the job shape.

Spark-first plan — ONE narrow map-side pass, zero shuffles:

1. Registry lookup (`infer_schemas`): ONE sample row per schema hash
   (`groupBy(hash).agg(first(json))` — a tiny map-side-combined aggregate,
   rows collected = number of schema versions, the same driver-bounded
   metadata the reference reads from its schema table).
2. Union schema: merge field lists across versions by name; a same-name
   type conflict is a hard error listing the offending hashes (the
   reference's schema-evolution guard; widening is the registry's job).
3. Flatten: a single `from_json` with the union schema — a JSON row missing
   a field yields NULL for it, exactly the union-with-nulls contract. The
   decode is JVM Jackson inside codegen; no Python anywhere.

At 100 TB this is a pure scan→project job: it pipelines with the parquet
read, and partition pruning on `ds` passes straight through.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def infer_schemas(
    logs: DataFrame, hash_col: str = "schema_hash", json_col: str = "value_json"
) -> dict[str, T.StructType]:
    """One schema per hash, inferred from a single sample row each — the
    registry lookup. Deterministic: `first` under an explicit `min(json)`
    tie-break so re-runs see the same sample."""
    samples = (
        logs.where(F.col(json_col).isNotNull())
        .groupBy(hash_col)
        .agg(F.min(json_col).alias("__sample"))
        .collect()
    )
    spark = logs.sparkSession
    out: dict[str, T.StructType] = {}
    for row in samples:
        ddl = spark.range(1).select(F.schema_of_json(F.lit(row["__sample"]))).first()[0]
        try:
            dt = T.StructType.fromDDL(ddl)
        except AttributeError:  # pre-4.0 pyspark
            dt = T._parse_datatype_string(ddl)
        if not isinstance(dt, T.StructType):
            raise ValueError(f"schema_hash={row[hash_col]}: payload is not a JSON object ({ddl})")
        out[str(row[hash_col])] = dt
    return out


def union_schema(schemas: dict[str, T.StructType]) -> T.StructType:
    """Union of fields across schema versions, first-seen order; same-name
    type conflicts error with the hashes involved."""
    fields: dict[str, T.DataType] = {}
    owner: dict[str, str] = {}
    for h in sorted(schemas):
        for f in schemas[h].fields:
            if f.name in fields and fields[f.name] != f.dataType:
                raise ValueError(
                    f"field '{f.name}' type conflict: {fields[f.name].simpleString()} "
                    f"(schema {owner[f.name]}) vs {f.dataType.simpleString()} (schema {h})"
                )
            fields.setdefault(f.name, f.dataType)
            owner.setdefault(f.name, h)
    return T.StructType([T.StructField(n, t, True) for n, t in fields.items()])


def flatten_logs(
    logs: DataFrame,
    hash_col: str = "schema_hash",
    key_json: str = "key_json",
    value_json: str = "value_json",
    carry: tuple[str, ...] = ("ts",),
    schemas: dict[str, T.StructType] | None = None,
    key_schemas: dict[str, T.StructType] | None = None,
) -> DataFrame:
    """Flatten key/value JSON logs into one typed table: carried columns +
    the schema hash + every key field + every value field (union across
    schema versions, missing → NULL). Key/value field-name collisions are a
    hard error (they would silently shadow)."""
    ks = union_schema(key_schemas or infer_schemas(logs, hash_col, key_json))
    vs = union_schema(schemas or infer_schemas(logs, hash_col, value_json))
    clash = {f.name for f in ks.fields} & {f.name for f in vs.fields}
    if clash:
        raise ValueError(f"key/value field name collision: {sorted(clash)}")
    carried = [F.col(c) for c in carry] + [F.col(hash_col)]
    k = F.from_json(F.col(key_json), ks).alias("__k")
    v = F.from_json(F.col(value_json), vs).alias("__v")
    return logs.select(*carried, k, v).select(
        *[c for c in carry],
        hash_col,
        *[F.col(f"__k.{f.name}").alias(f.name) for f in ks.fields],
        *[F.col(f"__v.{f.name}").alias(f.name) for f in vs.fields],
    )
