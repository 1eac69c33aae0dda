"""Structured Streaming ingest variant of the KG pipeline (SURVEY §2.8).

The reference is strictly request/response — no streaming operators exist to
port.  This wrapper makes the batch pipeline incremental: a file-source
stream over a docs directory, the same fused extract→detect→link stages
(all map-side + broadcast join, so they run unchanged under the streaming
planner), and an append-mode sink with a checkpoint location per stage.
``trigger(availableNow=True)`` gives catch-up-then-stop semantics — the
streaming twin of a backfill batch.

A windowed/watermarked aggregation twin of the stats stage is included
(per-hour entity counts with late-data tolerance) as the canonical
stateful-streaming example over this pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import fixtures
from ..operators import linking
from ..operators.extract import extract_and_detect
from ..sources.tables import derive_docs


def stream_docs(spark: SparkSession, docs_dir: str,
                max_files_per_trigger: int | None = None) -> DataFrame:
    """File-source stream over driver-shaped documents parquet.
    `max_files_per_trigger` bounds each micro-batch (availableNow still
    drains everything, in multiple batches — how the incremental-CC test
    forces true multi-batch maintenance)."""
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    r = spark.readStream.schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = r.parquet(docs_dir)
    return derive_docs(raw)


def streaming_entities(spark: SparkSession, docs_dir: str) -> DataFrame:
    docs = stream_docs(spark, docs_dir)
    ments = extract_and_detect(docs, dedup=True)
    resolved = linking.resolve_label_universe(
        spark, [lbl for _, lbl, _ in fixtures.GAZETTEER])
    return linking.link_mentions_precomputed(ments, resolved)


def run_ingest(spark: SparkSession, docs_dir: str, out_dir: str,
               checkpoint_dir: str) -> None:
    """availableNow ingest: process all files currently present, then stop."""
    entities = streaming_entities(spark, docs_dir)
    q = (entities.writeStream
         .format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", checkpoint_dir)
         .outputMode("append")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def windowed_entity_counts(entities_with_ts: DataFrame,
                           watermark: str = "2 hours",
                           window: str = "1 hour") -> DataFrame:
    """Stateful streaming agg: entities per (1h window, type) with a
    watermark bounding late data — the streaming twin of stats.types
    distribution.  Works on any entities stream carrying `warc_ts`."""
    return (entities_with_ts
            .withWatermark("warc_ts", watermark)
            .groupBy(F.window("warc_ts", window).alias("win"), "type")
            .agg(F.count("*").alias("cnt")))


def dedup_stream(docs: DataFrame, watermark: str = "2 hours",
                 ts_col: str = "warc_ts", text_col: str = "text") -> DataFrame:
    """Streaming exact dedup: first-seen wins per content fingerprint
    within the watermark horizon (dropDuplicatesWithinWatermark) — the
    incremental twin of dedup.exact_dedup_groups/fingerprint.  State is one
    32-byte fingerprint per distinct doc and is EVICTED once the watermark
    passes, so state size is bounded by the dedup horizon, not the stream
    history — the property that makes exact dedup viable on an unbounded
    crawl feed (cross-horizon dups are the batch job's work)."""
    fp = F.md5(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")))
    return (docs.withColumn("fp", fp)
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(["fp"]))


SESSION_GAP_SEC = 1800
_SESSION_OUT = ("user_id bigint, session_no int, n_events int, "
                "session_start timestamp")
_SESSION_STATE = "session_no int, n_events int, last_us bigint, start_us bigint"


def _sessionize_fn(key, pdfs, state):
    """applyInPandasWithState update fn: per-user gap sessionization.

    State = (current session number, its event count, last/first event time
    as integer MICROseconds — float seconds would round-trip through ns with
    sub-µs junk Arrow refuses to truncate).  Emits one row per COMPLETED
    session; the open session stays in state until a later event (or
    timeout) closes it.  Same 30-min-gap rule as the batch twin
    q32_sessionize."""
    import pandas as pd
    (user_id,) = key
    gap_us = SESSION_GAP_SEC * 1_000_000
    if state.hasTimedOut:
        sess_no, n, _last, start = state.get
        state.remove()
        yield pd.DataFrame({"user_id": [user_id], "session_no": [sess_no],
                            "n_events": [n],
                            "session_start": [pd.Timestamp(start, unit="us")]})
        return
    sess_no, n, last, start = state.get if state.exists else (0, 0, None, None)
    out = []
    ts_all = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
    for ts in ts_all:
        t = ts.value // 1000  # ns -> us
        if last is None or t - last > gap_us:
            if n > 0:
                out.append((user_id, sess_no, n, pd.Timestamp(start, unit="us")))
            sess_no, n, start = sess_no + 1, 0, t
        # `last`/`start` are monotone max/min: an out-of-order event from a
        # LATER micro-batch (valid while above the watermark) joins the open
        # session without dragging the gap anchor backwards — unguarded
        # `last = t` would falsely split one session in two.  Disorder
        # reaching back past an already-EMITTED session is unsupported
        # (append mode cannot amend output); such events fold into the open
        # session.
        n += 1
        last = t if last is None or t > last else last
        start = t if t < start else start
    state.update((sess_no, n, last, start))
    # EVENT-time timeout (fires when the watermark passes last+gap): a
    # processing-time timeout would keep an availableNow run spinning
    # "cleaning up state" micro-batches for the full wall-clock gap.
    state.setTimeoutTimestamp(last // 1000 + SESSION_GAP_SEC * 1000)
    yield pd.DataFrame(out, columns=["user_id", "session_no", "n_events",
                                     "session_start"])


def sessionize_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: gap-based
    sessionization (30-min inactivity) over an events stream — the streaming
    twin of the batch q32_sessionize window formulation.  State is one tiny
    tuple per user; timeout closes idle sessions so state size is bounded by
    ACTIVE users, not history.  (§2.8 — the reference has no streaming at
    all; this is the task-mandated custom-stateful-operator capability.)"""
    from pyspark.sql.streaming.state import GroupStateTimeout
    return (events
            .withColumn("ts", F.col("ts").cast("timestamp"))  # parquet NTZ
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn, _SESSION_OUT, _SESSION_STATE,
                "append", GroupStateTimeout.EventTimeTimeout))


def canonicalize_stream(spark: SparkSession, docs_dir: str, state_dir: str,
                        checkpoint_dir: str, max_files_per_trigger: int | None = None) -> None:
    """Streaming incremental canonicalization (O-29's maintenance story,
    now an actual stream): each micro-batch's linked entities contribute
    same-as/alias edges, and ``merge_components`` folds them into the
    persisted (node, comp) state — per-batch cost O(|components| + |batch|),
    never O(|history|), because the state itself is a star edge relation
    with the same connectivity as everything already seen.

    State lives as a parquet dir (an Iceberg table at cluster scale — same
    seam as StageCheckpoint).  The merged frame is eagerly materialized
    (localCheckpoint) BEFORE the overwrite: the state write truncates the
    very files the lazy plan would still need to read."""
    from pyspark.errors import AnalysisException

    from ..operators.canonicalize import entity_edges, merge_components

    docs = stream_docs(spark, docs_dir, max_files_per_trigger=max_files_per_trigger)
    ments = extract_and_detect(docs, dedup=True)
    resolved = linking.resolve_label_universe(
        spark, [lbl for _, lbl, _ in fixtures.GAZETTEER])
    entities = linking.link_mentions_precomputed(ments, resolved)

    def _fold(batch_df, _batch_id):
        s = batch_df.sparkSession
        edges = entity_edges(batch_df).localCheckpoint()
        try:
            comps = s.read.parquet(state_dir)
        except AnalysisException:
            comps = s.createDataFrame([], "node string, comp string")
        merged = merge_components(comps, edges).localCheckpoint()
        merged.write.mode("overwrite").parquet(state_dir)

    q = (entities.writeStream
         .foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def neardup_stream(spark: SparkSession, docs_dir: str, state_dir: str,
                   pairs_dir: str, checkpoint_dir: str,
                   max_hamming: int = 3, bucket_cap: int = 0,
                   max_files_per_trigger: int | None = None) -> None:
    """Streaming near-duplicate maintenance — the dedup analog of
    ``canonicalize_stream``: each micro-batch simhashes its NEW documents,
    band-joins them against the batch itself PLUS the persisted
    (doc_id, simhash) history, appends the Hamming-verified pairs, and folds
    the batch into the history.

    Per-batch cost is O(|batch| × bucket-membership) — the history side is
    touched only through the band join on the new docs' keys, never
    pair-joined against itself, and every true pair is emitted exactly once
    (at the batch where its LATER member arrives).  With the default
    bucket_cap=0 the accumulated pairs equal the one-shot batch
    ``simhash_near_dups(bucket_cap=0)`` over the full corpus
    (pytest-asserted across 4 real micro-batches); at cluster scale set a
    cap to bound degenerate boilerplate buckets — capping is per-batch, so
    incremental and one-shot results may then legitimately differ."""
    from pyspark.errors import AnalysisException

    from ..operators import dedup

    docs = stream_docs(spark, docs_dir, max_files_per_trigger=max_files_per_trigger)

    def _fold(batch_df, _batch_id):
        s = batch_df.sparkSession
        new_sh = dedup.simhash(batch_df.select("doc_id", "text"),
                               "doc_id", "text").localCheckpoint()
        try:
            hist = s.read.parquet(state_dir)
        except AnalysisException:
            hist = s.createDataFrame([], "doc_id long, simhash string")
        all_sh = hist.unionByName(new_sh).localCheckpoint()
        lb = dedup.simhash_bands(all_sh)
        if bucket_cap:
            from pyspark.sql import Window
            w = Window.partitionBy("band_id", "band_key").orderBy("doc_id")
            lb = (lb.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= bucket_cap).drop("_rn"))
        rb = dedup.simhash_bands(new_sh)
        cand = (lb.select(F.col("doc_id").alias("a"), "band_id", "band_key")
                .join(rb.select(F.col("doc_id").alias("b"), "band_id", "band_key"),
                      ["band_id", "band_key"])
                .filter(F.col("a") != F.col("b"))
                .select(F.least("a", "b").alias("a"),
                        F.greatest("a", "b").alias("b")).distinct())
        sa = all_sh.select(F.col("doc_id").alias("a"), F.col("simhash").alias("sim_a"))
        sb = all_sh.select(F.col("doc_id").alias("b"), F.col("simhash").alias("sim_b"))
        ham = F.bit_count(F.conv("sim_a", 2, 10).cast("long")
                          .bitwiseXOR(F.conv("sim_b", 2, 10).cast("long")))
        pairs = (cand.join(sa, "a").join(sb, "b")
                 .withColumn("hamming", ham.cast("long"))
                 .filter(F.col("hamming") <= max_hamming)
                 .select("a", "b", "hamming").localCheckpoint())
        pairs.write.mode("append").parquet(pairs_dir)
        all_sh.write.mode("overwrite").parquet(state_dir)

    q = (docs.writeStream
         .foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
