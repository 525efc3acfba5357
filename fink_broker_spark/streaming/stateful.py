"""Custom stateful streaming: per-key running aggregates with
``applyInPandasWithState``.

The reference keeps NO streaming state (SURVEY §2.11) — every cumulative
view is rebuilt nightly in batch. This operator is the streaming-native
alternative: a per-key running counter/sum maintained in Spark's state
store across micro-batches, emitting the updated totals each batch.
The state entry per key is a handful of scalars, so state size is
O(distinct keys) — the same bound as the watermarked dedup operator.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def running_totals(
    sdf: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """Streaming per-key running (count, sum): emits one row per key per
    micro-batch with the totals including all batches so far."""
    key_fields = [StructField(k, StringType()) for k in keys]
    out_schema = StructType(
        key_fields
        + [StructField("n", LongType()), StructField("total", DoubleType())]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                **{k: [key[i]] for i, k in enumerate(keys)},
                "n": [n],
                "total": [total],
            }
        )

    return (
        sdf.groupBy(*keys)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def tws_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually run: its
    state-server protocol needs the ``google.protobuf`` runtime, absent
    in some containers (probed the same way as the spark-avro jar gate,
    ``sinks/kafka.py:avro_available``)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_totals_tws(
    sdf: DataFrame,
    keys: Sequence[str],
    value_col: str,
) -> DataFrame:
    """The same running (count, sum) on Spark 4's
    ``transformWithStateInPandas`` — the successor API to
    ``applyInPandasWithState`` (typed named state via a
    ``StatefulProcessor``, composable value/list/map state, timers).

    Functional twin of :func:`running_totals`; kept separate because the
    APIs differ operationally: transformWithState requires the RocksDB
    state-store provider and the protobuf runtime (probe with
    :func:`tws_available`), and its state schema is declared per named
    state handle instead of one struct. Batch-equivalence is asserted in
    ``tests/test_streaming.py`` for both, conditionally for this one.
    """
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    key_fields = [StructField(k, StringType()) for k in keys]
    out_schema = StructType(
        key_fields
        + [StructField("n", LongType()), StructField("total", DoubleType())]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, total = self._totals.get()
            else:
                n, total = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._totals.update((n, total))
            yield pd.DataFrame(
                {
                    **{k: [key[i]] for i, k in enumerate(keys)},
                    "n": [n],
                    "total": [total],
                }
            )

        def close(self) -> None:
            pass

    return sdf.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
