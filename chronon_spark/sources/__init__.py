from chronon_spark.sources.synth import synth_queries, synth_transcripts
from chronon_spark.sources.tables import TPCH_TABLES, load_table, transcripts_from_events

__all__ = ["synth_transcripts", "synth_queries", "load_table", "transcripts_from_events", "TPCH_TABLES"]
