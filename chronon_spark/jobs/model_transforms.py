"""ModelTransforms: batch model-inference enrichment of a source.

Reference: spark/src/main/scala/ai/chronon/spark/ModelTransformsJob.scala +
`ModelTransforms` in the Source union (thrift/api.thrift:195) — each model
projects its inputs via an input mapping, rows are sent to a model platform
in fixed-size batches, predictions come back as `{model}__{field}` output
columns, and only (outputs + passthrough fields) survive.

Spark-first shape: input mappings are codegen `selectExpr` projections; the
predict loop is `mapInPandas` (Arrow batches re-chunked to the platform's
batch size — the reference uses 100-row batches per task), so inference is
embarrassingly parallel with no shuffle and binary/feature payloads never
touch the driver.

The actual model platform is a deployment plug-point (the reference calls an
online `ModelPlatform` service): `platform="fake"` is a deterministic
numpy stand-in that makes the full plumbing testable; `platform="real"`
raises NotImplementedError at the exact call site a deployment would wire
its inference client into (same pattern as the multimodal decoder).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

BATCH_SIZE = 100  # rows per predict call (reference ModelTransformsJob.BatchSize)


@dataclass(frozen=True)
class Model:
    name: str
    input_mapping: dict[str, str]  # input field -> Spark SQL expr over the source
    output_fields: tuple[str, ...]  # prediction fields the platform returns


@dataclass
class ModelTransforms:
    models: list[Model]
    passthrough_fields: list[str] = field(default_factory=list)


def fake_predict(model: Model, inputs: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Deterministic stand-in platform: every output field is a sigmoid of
    the (field-salted) sum of the numeric inputs — reproducible in tests."""
    n = len(next(iter(inputs.values()))) if inputs else 0
    total = np.zeros(n, np.float64)
    for k in sorted(inputs):
        v = pd.to_numeric(pd.Series(inputs[k]), errors="coerce").to_numpy(np.float64)
        total += np.nan_to_num(v)
    out = {}
    for i, f_name in enumerate(model.output_fields):
        out[f_name] = 1.0 / (1.0 + np.exp(-(total * 1e-3 + i)))
    return out


def model_transforms(
    df: DataFrame,
    conf: ModelTransforms,
    platform: str | Callable[[Model, dict[str, np.ndarray]], dict[str, np.ndarray]] = "fake",
    batch_size: int = BATCH_SIZE,
) -> DataFrame:
    """Enrich `df` with every model's predictions; output columns are
    `{model}__{output_field}` plus the passthrough fields."""
    if platform == "real":
        raise NotImplementedError(
            "wire your inference client here (reference: ModelPlatformProvider / "
            "PredictRequest); no model-serving runtime exists in this environment"
        )
    predict = fake_predict if platform == "fake" else platform

    for m in conf.models:
        missing = [f for f in conf.passthrough_fields if f not in df.columns]
        if missing:
            raise ValueError(f"passthrough fields {missing} not in source columns {df.columns}")

    # input mappings: one codegen projection per model, prefixed to avoid
    # collisions (reference applyAllMappings with `{model}__input` prefixes)
    proj = [f"{expr} AS __in__{m.name}__{alias}" for m in conf.models for alias, expr in m.input_mapping.items()]
    src = df.selectExpr(*conf.passthrough_fields, *proj)

    out_fields = [T.StructField(p, df.schema[p].dataType, True) for p in conf.passthrough_fields]
    for m in conf.models:
        out_fields += [T.StructField(f"{m.name}__{f}", T.DoubleType(), True) for f in m.output_fields]
    out_schema = T.StructType(out_fields)
    models = list(conf.models)
    passthrough = list(conf.passthrough_fields)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # re-chunk the Arrow batch to the platform's batch size
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size]
                out = chunk[passthrough].copy()
                for m in models:
                    inputs = {
                        alias: chunk[f"__in__{m.name}__{alias}"].to_numpy()
                        for alias in m.input_mapping
                    }
                    preds = predict(m, inputs)
                    extra = set(preds) - set(m.output_fields)
                    missing = set(m.output_fields) - set(preds)
                    if extra or missing:
                        raise ValueError(
                            f"model {m.name}: platform returned fields {sorted(preds)}, "
                            f"declared {sorted(m.output_fields)}"
                        )
                    for f_name in m.output_fields:
                        out[f"{m.name}__{f_name}"] = np.asarray(preds[f_name], np.float64)
                yield out

    return src.mapInPandas(fn, schema=out_schema)
