"""User-facing facade mirroring the reference's ``Crocodile`` class.

A user of the reference drives everything through
``Crocodile(input_csv=df, dataset_name=..., table_name=...,
candidate_retrieval_limit=..., ...).run()`` (README.md:88-111; constructor
surface crocodile/crocodile.py:32-51). ``CrocodileSpark`` exposes the same
lifecycle on Spark:

  onboard (S1/S2 + M2 classification or explicit columns_type)
  -> EL phase (candidate generation replacing the LamAPI endpoint args,
     X1 features, W1/W2/W3 ranking)
  -> type frequencies (A1/A2) + typeFreq features (X3)
  -> logistic re-rank (M1/W4)
  -> export (J6 wide format; S8 CSV on request)

The two deliberate deviations from the reference's signature:
``entity_retrieval_endpoint``/``token`` are replaced by a ``kb`` DataFrame
(candidate retrieval is an in-engine blocking join, SURVEY.md S6), and
``max_workers``/``ml_ranking_workers`` are absent (Spark owns parallelism).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crocodile_spark.config import PipelineConfig


class CrocodileSpark:
    def __init__(
        self,
        input_csv,
        kb: DataFrame,
        client_id: str = "default",
        dataset_name: str = "default_dataset",
        table_name: str = "default_table",
        columns_type: dict | None = None,
        correct_qids: dict | None = None,
        max_candidates_in_result: int = 5,
        candidate_retrieval_limit: int = 16,
        top_n_for_type_freq: int = 3,
        save_output_to_csv: str | None = None,
        return_dataframe: bool = True,
        spark: SparkSession | None = None,
    ):
        """``input_csv``: a CSV path, a pandas DataFrame, or a Spark
        DataFrame (the reference accepts path or pandas,
        crocodile/crocodile.py:193-199). ``columns_type`` is the explicit
        NE/LIT/IGNORED override (crocodile.py:221-224); omitted -> the M2
        heuristic classifier runs on a <=1024-row sample (crocodile.py:
        206-220). ``correct_qids`` maps "{row_id}-{col_idx}" -> gold qid
        (crocodile.py:260-266)."""
        self.spark = spark or SparkSession.active()
        self.kb = kb
        self.client_id = client_id
        self.dataset_name = dataset_name
        self.table_name = table_name
        self.columns_type = columns_type
        self.correct_qids = correct_qids or {}
        self.save_output_to_csv = save_output_to_csv
        self.return_dataframe = return_dataframe
        self.cfg = PipelineConfig(
            max_candidates_in_result=max_candidates_in_result,
            candidate_retrieval_limit=candidate_retrieval_limit,
            top_n_for_type_freq=top_n_for_type_freq,
        )

        if isinstance(input_csv, str):
            self._pdf = pd.read_csv(input_csv)
        elif isinstance(input_csv, pd.DataFrame):
            self._pdf = input_csv
        elif isinstance(input_csv, DataFrame):
            self._pdf = input_csv.toPandas()
        else:
            raise TypeError("input_csv must be a path, pandas, or Spark DataFrame")
        self.header: list[str] = [str(c) for c in self._pdf.columns]

    # -- onboard -------------------------------------------------------------
    def _classify(self, sample: DataFrame) -> dict:
        if self.columns_type is not None:
            return self.columns_type
        from crocodile_spark.operators.classify import classify_columns

        return classify_columns(sample.limit(1024), columns=self.header)

    def onboard(self) -> DataFrame:
        """Input table -> the canonical input_rows shape (data array in
        header order, ne_cols/context_cols per the T1 complement law,
        correct_qids)."""
        import math

        def scrub(v):
            if v is None or (isinstance(v, float) and
                             (math.isnan(v) or math.isinf(v))):
                return None
            return str(v)

        typed = self.spark.createDataFrame(
            self._pdf.astype(object).where(pd.notna(self._pdf), None),
            schema=T.StructType(
                [T.StructField(c, T.StringType(), True) for c in self.header]
            ),
        )
        cols = self._classify(typed)
        ne = {str(k): v for k, v in cols.get("NE", {}).items()}
        ignored = {str(i) for i in cols.get("IGNORED", [])}
        # context = all columns minus IGNORED (T1 law, crocodile.py:226-231)
        context = [i for i in range(len(self.header)) if str(i) not in ignored]

        rows = []
        for row_id, rec in enumerate(self._pdf.itertuples(index=False, name=None)):
            rows.append(
                (
                    self.client_id,
                    self.dataset_name,
                    self.table_name,
                    row_id,
                    [scrub(v) for v in rec],
                    ne,
                    context,
                    {
                        k: v
                        for k, v in self.correct_qids.items()
                        if k.startswith(f"{row_id}-")
                    },
                )
            )
        schema = T.StructType(
            [
                T.StructField("client_id", T.StringType(), False),
                T.StructField("dataset_name", T.StringType(), False),
                T.StructField("table_name", T.StringType(), False),
                T.StructField("row_id", T.IntegerType(), False),
                T.StructField("data", T.ArrayType(T.StringType()), True),
                T.StructField("ne_cols", T.MapType(T.StringType(), T.StringType()), True),
                T.StructField("context_cols", T.ArrayType(T.IntegerType()), True),
                T.StructField("correct_qids", T.MapType(T.StringType(), T.StringType()), True),
            ]
        )
        return self.spark.createDataFrame(rows, schema)

    # -- full lifecycle --------------------------------------------------------
    def run(self):
        """Onboard -> EL -> type frequencies -> logistic re-rank -> J6-shape
        export. Returns the enriched wide table (Spark DataFrame, or pandas
        when return_dataframe=True like the reference)."""
        from crocodile_spark.operators.el import export_el, link_cells
        from crocodile_spark.operators.typefreq import (
            attach_type_freq_features,
            global_type_frequencies,
            ml_rerank,
        )

        input_rows = self.onboard()
        ranked = link_cells(input_rows, self.kb, self.cfg)
        freqs = global_type_frequencies(ranked, self.cfg)
        ranked = attach_type_freq_features(ranked, freqs, self.cfg)
        reranked = ml_rerank(ranked, self.cfg)
        # W4 law: the ML rank replaces the heuristic rank for el_results
        final = reranked.withColumn("rank", F.col("ml_rank"))
        out = export_el(final, input_rows)
        # reference export shape: the ORIGINAL columns (not a data array)
        # followed by {col}_id/_name/_desc/_score (crocodile.py:448-475)
        orig = [
            F.try_element_at("data", F.lit(i + 1)).alias(c)
            for i, c in enumerate(self.header)
        ]
        rest = [c for c in out.columns if c not in
                ("client_id", "dataset_name", "table_name", "row_id", "data")]
        out = out.select("row_id", *orig, *rest)
        if self.save_output_to_csv:
            from crocodile_spark.sources.tabular import export_csv

            export_csv(out, self.save_output_to_csv, single_file=True)
        return out.toPandas() if self.return_dataframe else out
