from chronon_spark.operators.asof_join import asof_join, compute_join
from chronon_spark.operators.bootstrap import bootstrap_asof_join
from chronon_spark.operators.mutations import entity_last_value_asof, entity_state_asof
from chronon_spark.operators.slicing import sliced_asof_join
from chronon_spark.operators.tiles import tiled_sawtooth_asof_join
from chronon_spark.operators.trailing import trailing_features
from chronon_spark.operators.windows import hopping_window_agg, lag_lead, sessionize, tumbling_window_agg

__all__ = [
    "asof_join",
    "compute_join",
    "bootstrap_asof_join",
    "entity_state_asof",
    "entity_last_value_asof",
    "sliced_asof_join",
    "tiled_sawtooth_asof_join",
    "trailing_features",
    "sessionize",
    "lag_lead",
    "tumbling_window_agg",
    "hopping_window_agg",
]
