"""Training-data pipeline functions: text analysis, deduplication,
similarity search, multimodal column plumbing.

Everything here is expressed with JVM-side ``pyspark.sql.functions`` (Catalyst
codegen, no Python in the hot path) except where an algorithm genuinely needs
numpy — those use Arrow-batched pandas UDFs.
"""
