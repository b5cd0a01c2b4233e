from chronon_spark.aggregators.kernels import EventColumns, compute_parts

__all__ = ["EventColumns", "compute_parts"]
