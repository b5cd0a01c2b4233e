"""Sink table lifecycle: create-if-absent, dynamic partition overwrite,
schema auto-expand, archive-on-semantic-change.

Port of the reference's table management (spark/src/main/scala/ai/chronon/
spark/catalog/TableUtils.scala):

- ``insertPartitions`` (:259-358): create the table from the first write's
  schema, then per-write overwrite ONLY the partitions present in the
  incoming DataFrame (dynamic partition overwrite);
- ``expandTable`` (:620-660): with ``auto_expand`` new columns are appended
  to the table schema (old partitions read as NULL), deprecated columns are
  written as NULL, and a TYPE change is an error listing every inconsistent
  field;
- ``archiveTableIfExists`` (:543-552) + semantic-hash recompute detection
  (JoinUtils.tablesToRecompute:293-305): when the spec's semantic hash
  changes, the existing table is renamed aside with a timestamp suffix and a
  fresh one is created — old outputs stay auditable, nothing is silently
  mixed.

The sandbox has no Iceberg runtime, so the physical form is a partitioned
parquet directory + ``_table_meta.json`` (authoritative schema, semantic
hash, properties). Every operation maps 1:1 onto the Iceberg calls a
deployment would use instead: ``df.writeTo(t).overwritePartitions()``,
``ALTER TABLE ... ADD COLUMNS``, ``ALTER TABLE ... RENAME TO``.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

META_FILE = "_table_meta.json"


class SchemaEvolutionError(ValueError):
    """Incompatible type change between the table and an incoming write."""


class ManagedTable:
    def __init__(self, spark: SparkSession, path: str, partition_col: str = "ds"):
        self.spark = spark
        self.path = path
        self.partition_col = partition_col

    # ---------------------------------------------------------------- meta

    @property
    def _meta_path(self) -> str:
        return os.path.join(self.path, META_FILE)

    def exists(self) -> bool:
        return os.path.exists(self._meta_path)

    def _read_meta(self) -> dict:
        with open(self._meta_path) as f:
            return json.load(f)

    def _write_meta(self, meta: dict) -> None:
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, self._meta_path)

    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self._read_meta()["schema"])

    def semantic_hash(self) -> str | None:
        return self._read_meta().get("semantic_hash")

    # ---------------------------------------------------------------- ops

    def insert_partitions(
        self,
        df: DataFrame,
        auto_expand: bool = False,
        semantic_hash: str | None = None,
        properties: dict | None = None,
    ) -> dict:
        """Write df's partitions into the table (overwriting only those
        partitions), applying the full lifecycle. Returns a small report."""
        if self.partition_col not in df.columns:
            raise ValueError(f"insert_partitions: df lacks partition column {self.partition_col!r}")
        report: dict = {"created": False, "archived": None, "added_columns": []}

        if self.exists() and semantic_hash is not None:
            stored = self.semantic_hash()
            if stored is not None and stored != semantic_hash:
                # spec changed: archive the old outputs, start fresh
                report["archived"] = self.archive()

        if not self.exists():
            os.makedirs(self.path, exist_ok=True)
            self._write_meta(
                {
                    "schema": df.schema.jsonValue(),
                    "partition_col": self.partition_col,
                    "semantic_hash": semantic_hash,
                    "properties": properties or {},
                    "created_at_unix": int(time.time()),
                }
            )
            report["created"] = True
        else:
            meta = self._read_meta()
            table_schema = T.StructType.fromJson(meta["schema"])
            table_fields = {f.name: f.dataType for f in table_schema.fields}
            incoming = {f.name: f.dataType for f in df.schema.fields}
            bad = [
                (n, table_fields[n].simpleString(), incoming[n].simpleString())
                for n in incoming
                if n in table_fields and table_fields[n].simpleString() != incoming[n].simpleString()
            ]
            if bad:
                raise SchemaEvolutionError(
                    "incompatible type changes (reference expandTable refuses these): "
                    + ", ".join(f"{n}: {a} --> {b}" for n, a, b in bad)
                )
            new_cols = [f for f in df.schema.fields if f.name not in table_fields]
            missing = [n for n in table_fields if n not in incoming]
            if not auto_expand and (new_cols or missing):
                raise SchemaEvolutionError(
                    f"column set changed (new={[f.name for f in new_cols]}, missing={missing}) "
                    "and auto_expand is off"
                )
            if new_cols:
                # partition column stays last (reference colOrder:
                # cols.diff(partitionColumns) ++ partitionColumns)
                non_part = [f for f in table_schema.fields if f.name != self.partition_col]
                part = [f for f in table_schema.fields if f.name == self.partition_col]
                meta["schema"] = T.StructType(non_part + new_cols + part).jsonValue()
                self._write_meta(meta)
                report["added_columns"] = [f.name for f in new_cols]
            if properties:
                meta["properties"] = {**meta.get("properties", {}), **properties}
                self._write_meta(meta)

        # finalize to the (possibly expanded) table schema: deprecated
        # columns write as NULL, order matches the table
        final_schema = self.schema()
        out = df.select(
            *[
                F.col(f.name) if f.name in df.columns else F.lit(None).cast(f.dataType).alias(f.name)
                for f in final_schema.fields
            ]
        )
        # dynamic partition overwrite: replace exactly the incoming partitions
        parts = [r[0] for r in out.select(self.partition_col).distinct().collect()]
        for p in parts:
            part_dir = os.path.join(self.path, f"{self.partition_col}={p}")
            out.where(F.col(self.partition_col) == p).drop(self.partition_col).write.mode(
                "overwrite"
            ).parquet(part_dir)
        report["partitions_written"] = sorted(str(p) for p in parts)
        return report

    def read(self) -> DataFrame:
        """Read with the authoritative schema: partitions written before an
        auto-expand surface the newer columns as NULL."""
        schema = self.schema()  # includes the partition column: no value inference
        df = (
            self.spark.read.schema(schema)
            .option("basePath", self.path)
            .parquet(os.path.join(self.path, f"{self.partition_col}=*"))
        )
        return df.select(*[f.name for f in schema.fields])

    def partitions(self) -> list[str]:
        pre = f"{self.partition_col}="
        if not os.path.isdir(self.path):
            return []
        return sorted(d[len(pre) :] for d in os.listdir(self.path) if d.startswith(pre))

    def archive(self, timestamp: float | None = None) -> str:
        """Rename the table directory aside (reference archiveTableIfExists):
        `{path}_archive_{utc-timestamp}`."""
        ts = time.strftime("%Y%m%d%H%M%S", time.gmtime(timestamp or time.time()))
        target = f"{self.path.rstrip('/')}_archive_{ts}"
        i = 0
        while os.path.exists(target):
            i += 1
            target = f"{self.path.rstrip('/')}_archive_{ts}_{i}"
        os.rename(self.path, target)
        return target
