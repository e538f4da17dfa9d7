"""Framework integrations (reference: integrations/langchain,
integrations/llamaindex) — LangChain and LlamaIndex vector-store
adapters over the Spark-native engine, with the reference's shared
input-validation layer. The framework packages are optional; each
adapter degrades to duck-typed stand-ins when they are not installed."""

from velesdb_spark.integrations.security import SecurityError

__all__ = ["SecurityError"]
