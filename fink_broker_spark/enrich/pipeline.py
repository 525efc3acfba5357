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
    """

    name: str
    inputs: Sequence[str]
    output: str
    fn: Callable[..., Column]
    #: temp output dropped at pipeline end (reference: ``:423-434``)
    temporary: bool = False


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

    def apply(self, df: DataFrame) -> DataFrame:
        """Run the pipeline: expand histories, apply processors in order
        (skipping those with missing inputs), drop temporaries."""
        out = df
        for fname in self.history_fields:
            out = concat_col(
                out,
                fname,
                current_prefix=self.current_prefix,
                history_col=self.history_col,
            )
        temp_cols: list[str] = []
        for proc in self.processors:
            missing = [c for c in proc.inputs if c not in out.columns]
            if missing:
                logger.warning(
                    "skipping processor %s: missing inputs %s", proc.name, missing
                )
                continue
            out = out.withColumn(proc.output, proc.fn(*proc.inputs))
            if proc.temporary:
                temp_cols.append(proc.output)
        if temp_cols:
            out = out.drop(*temp_cols)
        return out

    def required_columns(self) -> set[str]:
        return {c for p in self.processors for c in p.inputs}
