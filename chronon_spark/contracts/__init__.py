"""Driver-contract query/oracle registries, merged by __spark_entry__.py."""
