"""Sinks: Kafka message builder, Qdrant parity helpers, Milvus payload
builder. The engine-native sink is cdc.apply.ParquetCollection."""
