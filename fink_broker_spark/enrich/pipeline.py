"""Enrichment-operator framework: the science-module pipeline.

Re-expresses the reference's ``apply_science_modules``
(``fink_broker/ztf/science.py:201-436``) as a declarative registry:

- a **Processor** is a named enrichment operator: required input columns,
  an output column (or several), and either a pure Column expression or a
  pandas UDF. The reference's ~20 science modules (crossmatches, ML
  classifiers, feature extractors) all fit this signature
  (``ztf/science.py:257-431``, ``rubin/science.py:284-385``).
- an **EnrichmentPipeline** composes processors in order, handling the
  reference's column-lifecycle chores generically: history expansion via
  ``concat_col`` (``ztf/science.py:237-255``), temp-column tracking and
  cleanup (``ztf/science.py:369-374,406-434``), and missing-input skips
  (a processor whose inputs are absent is skipped with a log line, the
  schema-evolution behavior of ``common/hbase_utils.py:66-137``).

Pure-Column processors stay in whole-stage codegen; pandas-UDF processors
pay one Arrow boundary each — at 100 TB the pipeline's cost is dominated
by the number of UDF boundaries, so adjacent pure-Column steps are free
and UDF steps should be few and vectorized (SURVEY.md §7.3 hard part 4).
"""

from __future__ import annotations

import logging
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame

from fink_broker_spark.operators.arrays import concat_col

logger = logging.getLogger(__name__)


@dataclass
class Processor:
    """One enrichment operator.

    ``fn`` maps input Columns → output Column (pure expression or a
    pandas-UDF call — the pipeline doesn't care which).

    Alternatively supply ``pandas_fn`` (pandas ``Series`` → ``Series``)
    plus ``dtype``: the pipeline then owns the UDF wrapping and can
    FUSE consecutive pandas processors into one Arrow boundary (see
    :meth:`EnrichmentPipeline.apply`). When both are given, ``fn`` wins
    and the processor is opaque to fusion.
    """

    name: str
    inputs: Sequence[str]
    output: str
    fn: Callable[..., Column] | None = None
    #: temp output dropped at pipeline end (reference: ``:423-434``)
    temporary: bool = False
    #: pandas-level kernel (enables fusion); ``dtype`` is its Spark type
    pandas_fn: Callable | None = None
    dtype: str = "double"

    def __post_init__(self) -> None:
        if self.fn is None and self.pandas_fn is None:
            raise ValueError(f"processor {self.name}: fn or pandas_fn required")


@dataclass
class EnrichmentPipeline:
    """Ordered processor composition with history expansion + temp cleanup."""

    processors: list[Processor] = field(default_factory=list)
    #: history fields to expand as ``c<name>`` before processors run
    history_fields: Sequence[str] = ()
    history_col: str = "prv_candidates"
    current_prefix: str = "candidate."

    def add(self, processor: Processor) -> "EnrichmentPipeline":
        self.processors.append(processor)
        return self

    def apply(self, df: DataFrame, fuse: bool = True) -> DataFrame:
        """Run the pipeline: expand histories, apply processors in order
        (skipping those with missing inputs), drop temporaries.

        ``fuse=True`` (default) merges each maximal run of consecutive
        ``pandas_fn`` processors — including dependent chains, where one
        feeds the next — into ONE struct-returning pandas UDF, so the
        run pays a single Arrow serialize/deserialize boundary instead
        of one per processor. This is SURVEY.md §7.3 hard part 4
        ("operator fusion: group adjacent pandas UDFs"): the reference's
        science chain crosses ~20 Arrow boundaries per batch
        (``ztf/science.py:257-431``), the dominant pipeline cost at
        100 TB. Dependent chains genuinely need fusion — Spark's own
        ``ExtractPythonUDFs`` already co-batches *independent* UDFs in
        one projection but cannot merge a UDF that consumes another's
        output. Column-expression processors pass through untouched
        (they live in codegen, fusion is irrelevant). Fused results are
        asserted identical to unfused in ``tests/test_enrich_fusion.py``.
        """
        out = df
        for fname in self.history_fields:
            out = concat_col(
                out,
                fname,
                current_prefix=self.current_prefix,
                history_col=self.history_col,
            )
        temp_cols: list[str] = []
        runnable: list[Processor] = []
        produced = set(out.columns)
        for proc in self.processors:
            missing = [c for c in proc.inputs if c not in produced]
            if missing:
                logger.warning(
                    "skipping processor %s: missing inputs %s", proc.name, missing
                )
                continue
            runnable.append(proc)
            produced.add(proc.output)
            if proc.temporary:
                temp_cols.append(proc.output)

        batch: list[Processor] = []
        for proc in runnable:
            fusable = fuse and proc.fn is None and proc.pandas_fn is not None
            if fusable:
                batch.append(proc)
                continue
            out = self._flush_fused(out, batch)
            batch = []
            if proc.fn is not None:
                out = out.withColumn(proc.output, proc.fn(*proc.inputs))
            else:  # pandas_fn with fusion off: wrap singly
                out = self._flush_fused(out, [proc])
        out = self._flush_fused(out, batch)
        if temp_cols:
            out = out.drop(*temp_cols)
        return out

    @staticmethod
    def _flush_fused(df: DataFrame, batch: list[Processor]) -> DataFrame:
        """Apply a run of pandas processors as one struct-returning
        pandas UDF; intra-run dependencies execute sequentially inside
        the single Python call."""
        if not batch:
            return df
        import pandas as pd
        from pyspark.sql.functions import col, pandas_udf
        from pyspark.sql.types import StructField, StructType, _parse_datatype_string

        out_schema = StructType(
            [
                StructField(p.output, _parse_datatype_string(p.dtype))
                for p in batch
            ]
        )
        internal = {p.output for p in batch}
        ext_inputs: list[str] = []
        for p in batch:
            for c in p.inputs:
                if c not in internal and c not in ext_inputs:
                    ext_inputs.append(c)
        procs = list(batch)

        # no type hints: pandas_udf's hint inference has no Series*->
        # DataFrame signature; the explicit returnType carries the schema
        def _fused_kernel(*cols):
            env = dict(zip(ext_inputs, cols))
            for p in procs:
                env[p.output] = p.pandas_fn(*[env[c] for c in p.inputs])
            return pd.DataFrame({p.output: env[p.output] for p in procs})

        _fused = pandas_udf(_fused_kernel, out_schema)

        fused_col = "__fused"
        return (
            df.withColumn(fused_col, _fused(*[col(c) for c in ext_inputs]))
            .select("*", f"{fused_col}.*")
            .drop(fused_col)
        )

    def required_columns(self) -> set[str]:
        return {c for p in self.processors for c in p.inputs}
