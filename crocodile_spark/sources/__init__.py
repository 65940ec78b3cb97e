"""Source/sink layer (SURVEY.md section 2.1)."""

from crocodile_spark.sources.tabular import (  # noqa: F401
    export_csv,
    read_gold_cea,
    read_input_csv,
    read_pandas,
    write_training_samples,
)
