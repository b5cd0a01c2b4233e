"""External parts: request-context features attached to a Join's output.

The reference declares ``onlineExternalParts`` on Join (thrift/api.thrift:418)
as fetch-time-only enrichment — "Offline this will not produce any values" —
with one carve-out: the ``contextual`` source (Constants.scala:58-61), whose
values ARE the request fields, so it is computable offline from the left
table itself. Naming follows ExternalPartOps.fullName/valueFields
(Extensions.scala:827-841): ``ext[_{prefix}]_{source_name}_{field}``, and
missing contextual keys null-fill rather than error
(Extensions.scala:812-816, KeyMappingHelper).

Offline semantics here, mirroring that contract:

- contextual source  -> values projected from the left row (after the
  left->right keyMapping rename), null for absent columns;
- non-contextual     -> all-null typed columns by default (the reference's
  offline behavior), OR, when the caller supplies a ``values`` DataFrame
  for the source (a batch snapshot of the external service, same idea as
  the batch-simulated fetch in jobs/upload.py), a broadcast equi-join on
  the mapped keys.

Scale shape: contextual and null paths are pure projections (no exchange);
the values path broadcasts the external snapshot — external sources are
request-scoped dimension lookups, small by construction. Pass
``broadcast_values=False`` to let AQE pick the strategy for a large snapshot.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

CONTEXTUAL_NAME = "contextual"  # Constants.scala:58
_EXT_PREFIX = "ext"  # Constants.scala:59


@dataclass(frozen=True)
class ExternalSource:
    """thrift ExternalSource (api.thrift:164-168): name + key/value schema.

    ``value_columns`` maps field name -> Spark SQL type string (used to type
    the offline null-fill when no values snapshot is given)."""

    name: str
    key_columns: tuple[str, ...]
    value_columns: dict[str, str] = field(default_factory=dict)

    @property
    def is_contextual(self) -> bool:
        return self.name == CONTEXTUAL_NAME


@dataclass(frozen=True)
class ExternalPart:
    """thrift ExternalPart (api.thrift:390-397): source + left->right
    keyMapping (rename-only, per the thrift comment) + output prefix."""

    source: ExternalSource
    key_mapping: dict[str, str] = field(default_factory=dict)
    prefix: str | None = None

    def full_name(self) -> str:
        # ExternalPartOps.fullName: ext[_{prefix}]_{sanitized_source_name}
        bits = [_EXT_PREFIX] + ([self.prefix] if self.prefix else []) + [self.source.name]
        return "_".join(b.replace(" ", "_") for b in bits)

    def out_col(self, value_field: str) -> str:
        return f"{self.full_name()}_{value_field}"


def apply_external_parts(
    left: DataFrame,
    parts: list[ExternalPart],
    values: dict[str, DataFrame] | None = None,
    broadcast_values: bool = True,
) -> DataFrame:
    """Attach every part's value columns to ``left``.

    ``values`` optionally maps source name -> batch snapshot DataFrame whose
    columns are the source's key_columns + value_columns."""
    values = values or {}
    out = left
    left_cols = set(left.columns)
    for part in parts:
        src = part.source
        # flip {left: right} -> right key name -> left column (KeyMappingHelper)
        right_to_left = {r: l for l, r in part.key_mapping.items()}
        key_of = {k: right_to_left.get(k, k) for k in src.key_columns}

        if src.is_contextual:
            # contextual: value fields ARE the (mapped) request keys; missing -> null
            for vf in src.value_columns or {k: "string" for k in src.key_columns}:
                lcol = key_of.get(vf, right_to_left.get(vf, vf))
                if lcol in left_cols:
                    out = out.withColumn(part.out_col(vf), F.col(lcol))
                else:
                    out = out.withColumn(
                        part.out_col(vf), F.lit(None).cast(src.value_columns.get(vf, "string"))
                    )
        elif src.name in values:
            snap = values[src.name]
            proj = snap.select(
                *[F.col(k).alias(f"__ext_k_{k}") for k in src.key_columns],
                *[F.col(v).alias(part.out_col(v)) for v in src.value_columns],
            )
            if broadcast_values:
                proj = F.broadcast(proj)
            cond = [out[key_of[k]] == proj[f"__ext_k_{k}"] for k in src.key_columns]
            out = out.join(proj, cond, "left").drop(*[f"__ext_k_{k}" for k in src.key_columns])
        else:
            # reference offline contract: no values produced offline
            for vf, typ in src.value_columns.items():
                out = out.withColumn(part.out_col(vf), F.lit(None).cast(typ))
    return out
