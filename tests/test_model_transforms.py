"""ModelTransforms data path (reference ModelTransformsJob.scala): input
mappings -> batched predict -> prefixed outputs + passthrough, with the
platform stubbed deterministically (no model-serving runtime here)."""

from __future__ import annotations

import numpy as np
import pytest

from chronon_spark.jobs.model_transforms import Model, ModelTransforms, fake_predict, model_transforms
from chronon_spark.sources.synth import synth_transcripts


@pytest.fixture(scope="module")
def data(spark):
    return spark.createDataFrame(synth_transcripts(n_rows=500, n_convs=5))


def _conf():
    return ModelTransforms(
        models=[
            Model("toxicity", {"len": "n_chars", "turn": "turn_idx * 2"}, ("score",)),
            Model("quality", {"len": "n_chars"}, ("q1", "q2")),
        ],
        passthrough_fields=["conv_id", "turn_idx", "ts"],
    )


def test_schema_and_passthrough(spark, data):
    out = model_transforms(data, _conf())
    assert out.columns == ["conv_id", "turn_idx", "ts", "toxicity__score", "quality__q1", "quality__q2"]
    assert out.count() == data.count()


def test_values_match_pandas_oracle(spark, data):
    got = model_transforms(data, _conf()).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pdf = data.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    m = _conf().models[0]
    want = fake_predict(m, {"len": pdf["n_chars"].to_numpy(), "turn": (pdf["turn_idx"] * 2).to_numpy()})
    assert np.allclose(got["toxicity__score"].to_numpy(), want["score"], atol=1e-12, equal_nan=True)
    # second model sees only its own mapping
    want_q = fake_predict(_conf().models[1], {"len": pdf["n_chars"].to_numpy()})
    assert np.allclose(got["quality__q2"].to_numpy(), want_q["q2"], atol=1e-12, equal_nan=True)


def test_batching_respects_platform_batch_size(spark, data):
    # platform echoes its batch size into every prediction — the closure runs
    # on executors, so observe chunk sizes through the output values
    def echo_size(model, inputs):
        n = len(next(iter(inputs.values())))
        return {f: np.full(n, float(n)) for f in model.output_fields}

    out = model_transforms(data, _conf(), platform=echo_size, batch_size=64).toPandas()
    sizes = out["toxicity__score"].to_numpy()
    assert sizes.max() <= 64 and sizes.min() >= 1 and len(sizes) == data.count()


def test_platform_field_mismatch_raises(spark, data):
    def bad(model, inputs):
        return {"wrong": np.zeros(len(next(iter(inputs.values()))))}

    with pytest.raises(Exception, match="declared"):
        model_transforms(data, _conf(), platform=bad).count()


def test_real_platform_is_stubbed(spark, data):
    with pytest.raises(NotImplementedError, match="inference client"):
        model_transforms(data, _conf(), platform="real")
