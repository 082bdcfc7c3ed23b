"""Spark operators: DataFrame plans + Arrow-batched kernel stages."""
