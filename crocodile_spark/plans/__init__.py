"""Query plans for the driver contract (__spark_entry__) and benchmarks."""
