"""Spark-side layer: DataFrame-native sketch build / merge / validate.

All heavy work stays in the JVM (scans, shuffles, exact aggregations)
or crosses to Python only as Arrow batches into vectorized pandas
UDFs — never per-row Python (north_rule)."""
