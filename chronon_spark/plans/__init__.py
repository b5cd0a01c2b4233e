from chronon_spark.plans.manifest import run_partitioned_backfill, unfilled_partitions

__all__ = ["run_partitioned_backfill", "unfilled_partitions"]
