"""Quorum deduplication — the reference's core stateful operator.

Semantics (ref MongoDBOplogSource.java:116-128): every logical op
arrives once per replica member of its shard; the operator emits each op
EXACTLY ONCE, as soon as it has been confirmed by a quorum of members,
and never again (while its state lives — see TTL below).

Four deliberate fixes over the reference (SURVEY.md §4.3):

* **majority quorum, not all-members** — the reference requires
  `replicaDepth` arrivals, so one dead replica stalls emission forever
  and strands its counter entries. Quorum here defaults to
  ``replica_depth // 2 + 1``.
* **event-time state TTL** — keys that never reach quorum are evicted
  once the watermark passes (op event time + ttl), instead of leaking
  (`documentCounter` in the reference grows unboundedly). Event-time
  timers keep micro-batches purely data-driven (processing-time timers
  would spin empty cleanup batches).
* **offsets commit after sink commit** — inherited from Structured
  Streaming's checkpoint protocol, fixing the reference's
  checkpoint-before-emit loss window.
* **per-shard replica depth** — the reference sizes every op's counter
  from the FIRST shard's member count (MongoOplogTailMapper.java:64);
  ``shard_depths`` gives each op its own shard's majority instead
  (joined in as a per-row column — state stays keyed by `h` alone).

Spark mapping: keyed state via ``applyInPandasWithState`` on the op id
``h`` with ``EventTimeTimeout``. State = (arrivals seen, emitted?, first
payload). The operator sits directly downstream of the source — before
any wide transformation — mirroring the reference's "dedup before
fan-out" plan shape (SURVEY.md §4.1), which shrinks the stream
replica_depth× before any shuffle. Like dropDuplicatesWithinWatermark,
exactly-once holds for deliveries within the TTL horizon; stragglers
beyond it restart the count (documented at-least-once tail).

Batch twin: ``quorum_dedup_batch`` (used by the oracle-checked q62 and
the replay tests).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Envelope of a logical op flowing out of the (simulated) oplog source.
# Field names follow the oplog schema (FIXTURES.md A1; names from the
# reference's MongoDBConstants.java:24-28).
OP_SCHEMA = StructType(
    [
        StructField("h", LongType(), False),
        StructField("ts_t", IntegerType(), False),
        StructField("ts_i", IntegerType(), False),
        StructField("op", StringType(), False),
        StructField("ns", StringType(), False),
        StructField("o", StringType(), True),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("seen", IntegerType(), False),
        StructField("emitted", BooleanType(), False),
        StructField("ts_t", IntegerType(), True),
        StructField("ts_i", IntegerType(), True),
        StructField("op", StringType(), True),
        StructField("ns", StringType(), True),
        StructField("o", StringType(), True),
    ]
)

_OUT_COLS = [f.name for f in OP_SCHEMA.fields]

# Per-row quorum column name for heterogeneous shard depths (see
# _with_quorum_col): every delivery of an op carries its shard's quorum,
# so keyed state stays keyed by `h` alone and no second dimension leaks
# into the state key space.
_QUORUM_COL = "__quorum"


def _with_quorum_col(ops: DataFrame, default_quorum: int, shard_depths: dict[str, int] | None):
    """Attach the per-row quorum: uniform (a literal) or per-shard
    (map lookup on the `shard` column — the fix for the reference's
    first-shard-only replicaDepth, MongoOplogTailMapper.java:64 /
    SURVEY §4.3.3). A tiny literal map stays in codegen; no join, no
    shuffle, no driver state. The uniform case attaches NO column at
    all: the quorum is baked into the Python closure instead, keeping
    one int64 per delivery out of the Arrow transfer (measurable at
    bench scale — 150k deliveries/batch)."""
    if not shard_depths:
        return ops.select(*_OUT_COLS)
    pairs = []
    for shard, depth in sorted(shard_depths.items()):
        pairs += [F.lit(shard), F.lit(depth // 2 + 1)]
    lookup = F.try_element_at(F.create_map(*pairs), F.col("shard"))
    return ops.select(*_OUT_COLS, "shard").withColumn(
        _QUORUM_COL, F.coalesce(lookup, F.lit(default_quorum))
    ).drop("shard")


def _quorum_fn(quorum: int, state_ttl_ms: int, per_shard: bool = False):
    """Build the per-key stateful function (module-level factory so Spark
    can pickle the closure to executors). ``per_shard`` means the rows
    carry a __quorum column (heterogeneous shard depths); otherwise the
    uniform ``quorum`` is baked into the closure.

    Hot-path notes: this function runs once per KEY per micro-batch
    (50k+ calls/batch at bench scale), so per-call pandas overhead is
    the throughput ceiling. Scalars are read with per-column ``.iat[0]``
    — ``pdf.iloc[0]`` would materialize a mixed-dtype Series per key
    (~2x slower end-to-end, measured) — and the column presence check is
    resolved once at plan build, not per key."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Sub-quorum straggler (or long-emitted key): evict — the fix
            # for the reference's unbounded documentCounter leak.
            state.remove()
            return
        seen, emitted, ts_t, ts_i, op, ns, o = (
            state.get if state.exists else (0, False, None, None, None, None, None)
        )
        n_new = 0
        max_ts_t = 0
        key_quorum = quorum
        for pdf in pdfs:
            n = len(pdf)
            if n:
                if per_shard:
                    key_quorum = int(pdf[_QUORUM_COL].iat[0])
                if ts_t is None:
                    ts_t = int(pdf["ts_t"].iat[0])
                    ts_i = int(pdf["ts_i"].iat[0])
                    op = pdf["op"].iat[0]
                    ns = pdf["ns"].iat[0]
                    o = pdf["o"].iat[0]
                # numpy path: Series.max() carries ~3x the per-call
                # overhead, and this runs once per key per batch
                t = int(pdf["ts_t"].to_numpy().max())
                if t > max_ts_t:
                    max_ts_t = t
                n_new += n
        seen += n_new
        if not emitted and seen >= key_quorum:
            emitted = True
            yield pd.DataFrame(
                {
                    "h": (key[0],),
                    "ts_t": (ts_t,),
                    "ts_i": (ts_i,),
                    "op": (op,),
                    "ns": (ns,),
                    "o": (o,),
                }
            )
        state.update((seen, emitted, ts_t, ts_i, op, ns, o))
        # Event-time TTL: state lives until watermark > op time + ttl.
        # Guard: Spark requires the timeout to sit beyond the watermark.
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(max_ts_t * 1000 + state_ttl_ms, wm + 1))

    return fn


def quorum_dedup_stream(
    ops: DataFrame,
    replica_depth: int,
    quorum: int | None = None,
    state_ttl_ms: int = 60_000,
    watermark_delay: str = "10 seconds",
    shard_depths: dict[str, int] | None = None,
) -> DataFrame:
    """Streaming quorum dedup keyed by op id `h`.

    ``ops`` must carry the OP_SCHEMA columns (extra columns such as
    member_host are dropped — they only exist to multiply deliveries).
    The oplog timestamp seconds (`ts_t`) provide the event-time clock
    for the watermark and state TTL.

    ``shard_depths`` maps shard name -> replica-set size for
    heterogeneous clusters (a 2-member and a 3-member shard in one
    topology): each op's quorum is then its OWN shard's majority,
    fixing the reference defect of sizing every counter from the first
    shard's depth (MongoOplogTailMapper.java:64, SURVEY §4.3.3).
    Requires a `shard` column on ``ops``.
    """
    q = quorum if quorum is not None else replica_depth // 2 + 1
    with_time = _with_quorum_col(ops, q, shard_depths).withColumn(
        "event_ts", F.timestamp_seconds(F.col("ts_t"))
    )
    return (
        with_time.withWatermark("event_ts", watermark_delay)
        .groupBy("h")
        .applyInPandasWithState(
            _quorum_fn(q, state_ttl_ms, per_shard=bool(shard_depths)),
            outputStructType=OP_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def quorum_dedup_batch(
    ops: DataFrame,
    replica_depth: int,
    quorum: int | None = None,
    shard_depths: dict[str, int] | None = None,
) -> DataFrame:
    """Batch twin (same emission set on a bounded replay): group by op id,
    emit the first-delivered payload of every op with >= quorum arrivals.
    One hash-shuffle on `h` — the replay/backfill path at scale.
    ``shard_depths``: see quorum_dedup_stream."""
    q = quorum if quorum is not None else replica_depth // 2 + 1
    if shard_depths:
        pairs = []
        for shard, depth in sorted(shard_depths.items()):
            pairs += [F.lit(shard), F.lit(depth // 2 + 1)]
        per_row_q = F.coalesce(
            F.try_element_at(F.create_map(*pairs), F.col("shard")), F.lit(q)
        )
    else:
        per_row_q = F.lit(q)
    w_first = F.struct(
        F.col("member_host"), F.col("ts_t"), F.col("ts_i"), F.col("op"), F.col("ns"), F.col("o")
    )
    agg = (
        ops.withColumn("__q", per_row_q)
        .groupBy("h")
        .agg(F.count("*").alias("seen"), F.min(w_first).alias("first"), F.max("__q").alias("__q"))
        .filter(F.col("seen") >= F.col("__q"))
    )
    return agg.select(
        "h",
        F.col("first.ts_t").alias("ts_t"),
        F.col("first.ts_i").alias("ts_i"),
        F.col("first.op").alias("op"),
        F.col("first.ns").alias("ns"),
        F.col("first.o").alias("o"),
    )


# ---------------------------------------------------------------------------
# transformWithState variant (Spark 4 stateful API)
# ---------------------------------------------------------------------------
# Same semantics as quorum_dedup_stream, built on the newer
# transformWithStateInPandas processor API (typed value state + event-time
# timers). Kept alongside the applyInPandasWithState form: the older API
# remains the broadly-deployed one, the processor API is where Spark's
# stateful streaming is heading (and what SURVEY.md §2A A6 maps to).
# NOTE: executing this path needs the RocksDB state store provider AND the
# `protobuf` Python package (Spark's Python state-server protocol); the
# test (tests/test_quorum_tws.py) skips where protobuf is unavailable.

from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle  # noqa: E402
from pyspark.sql.streaming.stateful_processor import TimerValues  # noqa: E402


class QuorumProcessor(StatefulProcessor):
    """Per-key (op id) processor: count replica arrivals, emit the op
    exactly once at quorum, evict state via an event-time timer."""

    def __init__(self, quorum: int, state_ttl_ms: int) -> None:
        self._quorum = quorum
        self._ttl_ms = state_ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._state = handle.getValueState(
            "quorum",
            "seen int, emitted boolean, ts_t int, ts_i int, op string, ns string, o string",
        )

    def handleInputRows(self, key, rows, timerValues: TimerValues):
        seen, emitted, ts_t, ts_i, op, ns, o = (
            self._state.get() if self._state.exists() else (0, False, None, None, None, None, None)
        )
        max_event_ms = 0
        for pdf in rows:
            if len(pdf) and ts_t is None:
                first = pdf.iloc[0]
                ts_t, ts_i, op, ns, o = (
                    int(first["ts_t"]),
                    int(first["ts_i"]),
                    first["op"],
                    first["ns"],
                    first["o"],
                )
            if len(pdf):
                max_event_ms = max(max_event_ms, int(pdf["ts_t"].max()) * 1000)
                seen += len(pdf)
        if not emitted and seen >= self._quorum:
            emitted = True
            yield pd.DataFrame([[key[0], ts_t, ts_i, op, ns, o]], columns=_OUT_COLS)
        self._state.update((seen, emitted, ts_t, ts_i, op, ns, o))
        wm = timerValues.getCurrentWatermarkInMs()
        self._handle.registerTimer(max(max_event_ms + self._ttl_ms, wm + 1))

    def handleExpiredTimer(self, key, timerValues: TimerValues, expiredTimerInfo):
        self._state.clear()
        return iter(())

    def close(self) -> None:
        pass


def quorum_dedup_stream_tws(
    ops: DataFrame,
    replica_depth: int,
    quorum: int | None = None,
    state_ttl_ms: int = 60_000,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """transformWithStateInPandas form of quorum_dedup_stream (identical
    emission semantics; requires the RocksDB state store provider, which
    the caller's session must set — see tests/test_quorum_tws.py)."""
    q = quorum if quorum is not None else replica_depth // 2 + 1
    with_time = ops.select(*_OUT_COLS).withColumn(
        "event_ts", F.timestamp_seconds(F.col("ts_t"))
    )
    return (
        with_time.withWatermark("event_ts", watermark_delay)
        .groupBy("h")
        .transformWithStateInPandas(
            QuorumProcessor(q, state_ttl_ms),
            outputStructType=OP_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )


# ---------------------------------------------------------------------------
# Pure-JVM windowed-aggregation variant (throughput path)
# ---------------------------------------------------------------------------


def quorum_dedup_stream_agg(
    ops: DataFrame,
    replica_depth: int,
    quorum: int | None = None,
    window_duration: str = "1 minute",
    watermark_delay: str = "10 seconds",
    shard_depths: dict[str, int] | None = None,
) -> DataFrame:
    """Quorum dedup as a watermarked windowed aggregation — zero Python,
    zero custom state: everything stays in Tungsten's streaming hash
    aggregate.

    Key insight making this correct: a MongoDB oplog entry carries the
    SAME `ts` on every replica member (it is the replicated record), so
    all deliveries of op `h` land in the same event-time window.
    `groupBy(window, h).count` therefore accumulates exactly that op's
    delivery count, and append mode emits the row once, when the
    watermark closes the window — with the quorum filter applied at
    emission.

    Tradeoff vs quorum_dedup_stream (Python keyed state): emission waits
    for window close + watermark delay instead of firing on the Nth
    arrival. Use this form for throughput-bound ingest (it is ~10x
    faster — see bench.py streaming_cdc_jvm); use the keyed-state form
    when per-op latency matters. State is bounded by the watermark in
    both (here: windows evict automatically).
    """
    q = quorum if quorum is not None else replica_depth // 2 + 1
    with_time = _with_quorum_col(ops, q, shard_depths).withColumn(
        "event_ts", F.timestamp_seconds(F.col("ts_t"))
    )
    # Uniform depth: no __quorum column flows (see _with_quorum_col) —
    # the threshold is a literal in the emission filter.
    quorum_expr = F.max(_QUORUM_COL) if shard_depths else F.lit(q)
    agged = (
        with_time.withWatermark("event_ts", watermark_delay)
        .groupBy(F.window("event_ts", window_duration), F.col("h"))
        .agg(
            F.count("*").alias("__seen"),
            F.min(F.struct("ts_t", "ts_i", "op", "ns", "o")).alias("__first"),
            quorum_expr.alias("__q"),
        )
        .filter(F.col("__seen") >= F.col("__q"))
    )
    return agged.select(
        "h",
        F.col("__first.ts_t").alias("ts_t"),
        F.col("__first.ts_i").alias("ts_i"),
        F.col("__first.op").alias("op"),
        F.col("__first.ns").alias("ns"),
        F.col("__first.o").alias("o"),
    )
