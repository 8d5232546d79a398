"""Sources and sinks: parquet/CSV/Avro/JSON readers and the broadcast
catalog registry."""
