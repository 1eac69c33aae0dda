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


# ---------------------------------------------------------------------------
# incremental maintenance folds (foreachBatch)
#
# BATCH SIZING (round-5 advice): both stream entry points default
# max_files_per_trigger=64 — with trigger(availableNow) and the default None
# a FIRST run over a pre-existing large corpus would deliver the whole
# backlog as ONE micro-batch, and the folds' batch-bounded probe structures
# (the neardup key probe, canonicalize's broadcast batch_nodes) are sized
# for micro-batches, not full corpora.  Both folds ALSO degrade gracefully
# on a fat batch: the neardup key probe switches from an IN-literal
# partition-pruned scan to a semi-join above NEARDUP_INLIST_MAX distinct
# keys, and merge_components_delta drops its forced broadcasts above
# DELTA_BROADCAST_MAX_NODES batch nodes (AQE then picks the strategy).
#
# Both folds share one durability design (round-4 review items):
#   * every per-batch write lands in its OWN batch_id=<N> partition dir with
#     mode("overwrite") — foreachBatch is at-least-once, so a batch replayed
#     after a crash between any write and the checkpoint commit simply
#     rewrites the same dirs with the same content (idempotent), instead of
#     double-appending;
#   * a commit MARKER (commits/batch_id=<N>) is written LAST; a replay of a
#     fully committed batch is skipped outright;
#   * state is append-only deltas — the fold never rewrites O(|history|)
#     state per batch;
#   * every `compact_every` batches BOTH folds snapshot their partitions
#     into one and vacuum the older dirs AND commit markers, so the
#     per-batch file-listing / partition-discovery / marker-check cost is
#     bounded (O(compact_every) dirs), not O(#batches); the marker check
#     itself reads only its own batch_id subdir (O(1)).
# At cluster scale the parquet-dir state is an Iceberg table (same seam as
# StageCheckpoint) and the vacuum/compaction below is table maintenance.
# ---------------------------------------------------------------------------


def _is_committed(s: SparkSession, commits_dir: str, batch_id: int) -> bool:
    # read ONLY this batch's marker dir — a whole-dir scan would make the
    # per-batch metadata check O(#batches); this one is O(1)
    from pyspark.errors import AnalysisException
    try:
        return s.read.parquet(f"{commits_dir}/batch_id={batch_id}").count() > 0
    except AnalysisException:
        return False


def _mark_committed(s: SparkSession, commits_dir: str, batch_id: int) -> None:
    (s.createDataFrame([(int(batch_id),)], "committed long")
     .write.mode("overwrite").parquet(f"{commits_dir}/batch_id={batch_id}"))


def _local_partition_ids(path: str) -> list[int]:
    """batch_id partition values under a LOCAL state dir (compaction probe;
    on an object store / Iceberg this is snapshot metadata, not a listing).
    Returns [] when the listing is unavailable — compaction is then skipped,
    which only defers the vacuum, never changes results."""
    import os
    try:
        return sorted(int(d.split("=", 1)[1]) for d in os.listdir(path)
                      if d.startswith("batch_id="))
    except (OSError, ValueError):
        return []


def read_components_raw(spark: SparkSession, state_dir: str,
                        exclude_batch: int | None = None) -> DataFrame:
    """LAZY (node, comp, batch_id) scan of a ``canonicalize_stream`` state
    dir's append-only delta partitions — no latest-wins aggregation, no
    materialization.  The fold prunes this scan down to the affected
    components BEFORE any aggregation (``affected_components_state``), so
    per-batch cost tracks the batch, not the state.

    `exclude_batch` is the fold's replay guard: a fold reads the state AS OF
    the batch before its own, so a replayed batch recomputes the IDENTICAL
    delta instead of diffing against a state that already contains its own
    partial write (partition-pruned, like the neardup probe)."""
    from pyspark.errors import AnalysisException
    try:
        raw = spark.read.option("basePath", f"{state_dir}/comps") \
            .parquet(f"{state_dir}/comps")
    except AnalysisException:
        return spark.createDataFrame(
            [], "node string, comp string, batch_id long")
    if exclude_batch is not None:
        raw = raw.filter(F.col("batch_id") != exclude_batch)
    return raw


def read_components(spark: SparkSession, state_dir: str,
                    exclude_batch: int | None = None) -> DataFrame:
    """Current (node, comp) view of a ``canonicalize_stream`` state dir:
    latest-batch-wins over the append-only delta partitions.  FULL-state
    aggregation — the external read surface and the compaction input; the
    per-batch fold path uses ``affected_components_state`` instead."""
    return (read_components_raw(spark, state_dir, exclude_batch)
            .groupBy("node")
            .agg(F.max_by("comp", "batch_id").alias("comp")))


def affected_components_state(raw: DataFrame, batch_nodes: DataFrame,
                              hint_broadcast: bool = True) -> DataFrame:
    """Current (node, comp) rows of ONLY the components containing a batch
    node, computed against the RAW delta scan — the streaming analog of
    ``canonicalize.affected_members`` that additionally pushes the pruning
    BELOW the latest-wins aggregation.

    Through round 6 the fold materialized the full latest-wins view every
    micro-batch (read_components().localCheckpoint()) — an O(state)
    shuffle + materialization per batch that the round-7 state-axis
    measurement (scripts/state_scale_check.py) would have shown growing
    linearly with state size.  This shape replaces it with three
    column-pruned scans of the delta partitions, each semi-join-filtered
    before any groupBy, so the only aggregated/materialized rows are the
    affected components':

      1. latest comp of each BATCH node (a node's latest row only needs
         that node's own rows, so the node semi-join loses nothing),
      2. candidate nodes that EVER carried one of those comps (a superset
         of current members — a node may have moved to another comp in a
         later delta),
      3. latest-wins over the candidates only, keeping rows still IN a
         touched comp.

    At cluster scale the scans stay shuffle-free on the state side (the
    probes broadcast in the micro-batch regime; a fat catch-up batch passes
    hint_broadcast=False and AQE chooses)."""
    from ..operators.canonicalize import DELTA_BROADCAST_MAX_NODES

    maybe = F.broadcast if hint_broadcast else (lambda df: df)
    # touched and cand are each consumed twice — materialize them so their
    # lineage (which scans the state) never re-executes per consumer; the
    # three state scans below are the fold's total
    touched = (raw.join(maybe(batch_nodes), "node", "left_semi")
               .groupBy("node")
               .agg(F.max_by("comp", "batch_id").alias("comp"))
               .select("comp").distinct().localCheckpoint())
    cand = (raw.join(maybe(touched), "comp", "left_semi")
            .select("node").distinct().localCheckpoint())
    # cand is bounded by affected-COMPONENT size, not batch size — a batch
    # touching a hub component makes it big.  It is already materialized,
    # so sizing it is one cheap count: small cand is FORCE-broadcast (the
    # final probe then never shuffles the state — a static SMJ here would
    # Exchange the whole state and only AQE's runtime rescue would demote
    # it); a hub-sized cand falls back to a shuffle join, which is then
    # genuinely the right plan.
    probe = cand if cand.count() > DELTA_BROADCAST_MAX_NODES \
        else F.broadcast(cand)
    return (raw.join(probe, "node", "left_semi")
            .groupBy("node")
            .agg(F.max_by("comp", "batch_id").alias("comp"))
            .join(maybe(touched), "comp", "left_semi"))


def canonicalize_stream(spark: SparkSession, docs_dir: str, state_dir: str,
                        checkpoint_dir: str,
                        max_files_per_trigger: int | None = 64,
                        compact_every: int = 8) -> None:
    """Streaming incremental canonicalization (O-29's maintenance story,
    now an actual stream): each micro-batch's linked entities contribute
    same-as/alias edges, and ``merge_components`` folds them into the
    persisted (node, comp) state.

    Per-batch cost: the state is scanned RAW (delta partitions, no
    aggregation) and pruned to the affected components with broadcast
    semi-joins BEFORE the latest-wins aggregation runs
    (``affected_components_state``) — so the only rows ever aggregated or
    materialized per batch are the affected components', and the CC rounds
    iterate only over the components the batch's edges actually touch
    (affected-member pruning, ``merge_components_delta``) — never the full
    node set.  (Through round 6 the fold materialized the FULL latest-wins
    view each batch; scripts/state_scale_check.py measures the difference
    on the state axis.)  The WRITE is
    only the DELTA (new nodes + nodes whose component changed), landing in
    its own batch_id partition — not a full-state rewrite.  Every
    `compact_every` batches the fold writes a full snapshot partition and
    vacuums the older delta dirs, bounding what ``read_components`` has to
    union.  Replay-safe: per-batch-dir overwrite + commit marker (see block
    comment above)."""
    from ..operators.canonicalize import entity_edges

    docs = stream_docs(spark, docs_dir, max_files_per_trigger=max_files_per_trigger)
    ments = extract_and_detect(docs, dedup=True)
    resolved = linking.resolve_label_universe(
        spark, [lbl for _, lbl, _ in fixtures.GAZETTEER])
    entities = linking.link_mentions_precomputed(ments, resolved)

    def _fold(batch_df, batch_id):
        canonicalize_fold(batch_df.sparkSession,
                          entity_edges(batch_df).localCheckpoint(),
                          int(batch_id), state_dir, compact_every)

    q = (entities.writeStream
         .foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


def canonicalize_fold(s: SparkSession, edges: DataFrame, batch_id: int,
                      state_dir: str, compact_every: int = 8) -> None:
    """One idempotent micro-batch fold of `edges` into the component state
    (module-level so the replay tests can drive it directly)."""
    import shutil

    from ..operators.canonicalize import merge_components_delta

    from ..operators.canonicalize import DELTA_BROADCAST_MAX_NODES

    comps_dir, commits_dir = f"{state_dir}/comps", f"{state_dir}/commits"
    if _is_committed(s, commits_dir, batch_id):
        return
    # exclude this batch's own partition: a replay after a crash mid-write
    # must see the state AS OF the previous batch, recomputing the same delta
    raw = read_components_raw(s, state_dir, exclude_batch=batch_id)
    batch_nodes = (edges.select(F.col("a").alias("node"))
                   .unionByName(edges.select(F.col("b").alias("node")))
                   .distinct().localCheckpoint())
    hint = batch_nodes.count() <= DELTA_BROADCAST_MAX_NODES
    # ONLY the affected components' current rows are aggregated and
    # materialized — through round 6 this was the FULL latest-wins view,
    # an O(state) shuffle+checkpoint per micro-batch (state-axis evidence:
    # scripts/state_scale_check.py, STATE_SCALE.json)
    old = affected_components_state(raw, batch_nodes,
                                    hint_broadcast=hint).localCheckpoint()
    # delta form: CC iterations run only over the components the batch's
    # edges touch (affected-member pruning in merge_components_delta) — the
    # write below IS the delta, no full-view diff join needed
    delta = merge_components_delta(old, edges).localCheckpoint()
    done = [i for i in _local_partition_ids(comps_dir) if i < batch_id]
    if len(done) >= compact_every:
        # snapshot + vacuum: full state into this batch's partition; the
        # marker lands BEFORE the vacuum, so a crash mid-deletion replays as
        # a committed no-op and latest-batch-wins shadows any leftover delta
        # dirs until a later compaction sweeps them
        # delta size is bounded by the affected-component sizes, not the
        # batch — no forced broadcast (AQE still picks one when it fits).
        # Compaction is the one place that genuinely reads the FULL
        # latest-wins state (it writes the full snapshot) — O(state) but
        # amortized 1/compact_every; the per-batch path above only ever
        # aggregates the affected slice.
        full = read_components(s, state_dir, exclude_batch=batch_id)
        merged = delta.unionByName(
            full.join(delta.select("node"), "node", "left_anti"))
        merged.write.mode("overwrite").parquet(f"{comps_dir}/batch_id={batch_id}")
        _mark_committed(s, commits_dir, batch_id)
        for old_id in done:
            shutil.rmtree(f"{comps_dir}/batch_id={old_id}", ignore_errors=True)
            # markers below the snapshot are vacuumed too: the checkpoint has
            # committed those batches, so they can never be re-delivered —
            # without this the commits dir grows one subdir per batch forever
            shutil.rmtree(f"{commits_dir}/batch_id={old_id}", ignore_errors=True)
        return
    delta.write.mode("overwrite").parquet(f"{comps_dir}/batch_id={batch_id}")
    _mark_committed(s, commits_dir, batch_id)


def neardup_stream(spark: SparkSession, docs_dir: str, state_dir: str,
                   pairs_dir: str, checkpoint_dir: str,
                   max_hamming: int = 3, bucket_cap: int = 64,
                   max_files_per_trigger: int | None = 64,
                   compact_every: int = 8) -> None:
    """Streaming near-duplicate maintenance — the dedup analog of
    ``canonicalize_stream``: each micro-batch simhashes its NEW documents,
    band-joins them against the batch itself plus the banded history, emits
    the Hamming-verified pairs, and appends ONLY the batch's banded rows to
    the history.

    Per-batch cost is O(|batch| × bucket-membership), including the history
    side: the history is stored PRE-BANDED, partitioned by band key, and the
    probe filters it with the batch's own key set — a partition-pruned scan
    (asserted in tests), never a re-banding or re-shuffle of all history.
    The verify step reads simhashes carried inside the banded rows, so no
    second history scan.  Every true pair is emitted exactly once, at the
    batch where its LATER member arrives — and stays exactly-once under
    foreachBatch REPLAY, because pairs land in a per-batch partition that a
    replay overwrites rather than re-appends (round-4 advice; commit-marker
    + per-batch-dir design in the block comment above).

    bucket_cap defaults to the batch path's ``dedup.BUCKET_CAP`` (64), NOT
    to unbounded: pair emission is inherently quadratic in
    duplicate-cluster size, and on a duplicate-saturated feed the uncapped
    fold measured 15× the wall at 10× the docs (scripts/streaming_rate.py,
    BENCH.md) — an unbounded default is the same backlog trap the finite
    max_files_per_trigger default exists to prevent.  The cap bounds
    degenerate boilerplate buckets AT WRITE TIME (history buckets never
    exceed the cap — the cap window orders by (batch_id, doc_id), so
    earlier ARRIVALS win and a later batch can never evict already-written
    history rows), making incremental and one-shot results legitimately
    divergent.  With an explicit bucket_cap=0 the accumulated pairs equal
    the one-shot batch ``simhash_near_dups(bucket_cap=0)`` over the full
    corpus (pytest-asserted across 4 real micro-batches).  Every `compact_every` batches the fold snapshots all
    history partitions into one and vacuums the older dirs + commit
    markers, bounding the per-batch listing cost."""
    docs = stream_docs(spark, docs_dir, max_files_per_trigger=max_files_per_trigger)

    def _fold(batch_df, batch_id):
        neardup_fold(batch_df.sparkSession, batch_df.select("doc_id", "text"),
                     int(batch_id), state_dir, pairs_dir,
                     max_hamming=max_hamming, bucket_cap=bucket_cap,
                     compact_every=compact_every)

    q = (docs.writeStream
         .foreachBatch(_fold)
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()


# above this many distinct band keys in one micro-batch, neardup_fold's
# history probe switches from an IN-literal (static partition pruning) to a
# semi-join — an IN list with millions of literals is a plan-size /
# expression-compile hazard, not a data-path one
NEARDUP_INLIST_MAX = 10_000


def neardup_fold(s: SparkSession, batch: DataFrame, batch_id: int,
                 state_dir: str, pairs_dir: str, max_hamming: int = 3,
                 bucket_cap: int = 64, compact_every: int = 8,
                 inlist_max: int = NEARDUP_INLIST_MAX) -> None:
    """One idempotent micro-batch fold of near-dup maintenance
    (module-level so the replay tests can drive it directly).
    `inlist_max` caps the driver-collected key set (see NEARDUP_INLIST_MAX);
    tests lower it to force the semi-join probe shape."""
    import shutil

    from pyspark.errors import AnalysisException
    from pyspark.sql import Window

    from ..operators import dedup

    hist_dir, commits_dir = f"{state_dir}/hist", f"{state_dir}/commits"
    if _is_committed(s, commits_dir, batch_id):
        return
    new_sh = dedup.simhash(batch, "doc_id", "text")
    # banded batch rows, simhash carried for the verify step; bkey is the
    # single (band_id, band_key) partition/join key
    nb = (dedup.simhash_bands(new_sh, carry=("simhash",))
          .withColumn("bkey", F.concat_ws("_", "band_id", "band_key"))
          .select("doc_id", "simhash", "bkey")
          .withColumn("batch_id", F.lit(int(batch_id)))
          .localCheckpoint())
    # the batch's key set drives partition pruning on the history scan —
    # O(|batch|) driver-side, the incremental analog of an index lookup.
    # FAT-BATCH GUARD (round-5 advice): collect at most inlist_max+1 keys;
    # a catch-up batch with more distinct keys would bloat one Filter
    # expression with millions of literals (plan-compile risk before any
    # data moves), so above the threshold the probe becomes a semi-join on
    # bkey instead — no driver-side key set at all, AQE picks the join
    # strategy, and partition pruning degrades to a scan of the (bounded,
    # compacted) history rather than a broken plan.
    key_rows = (nb.select("bkey").distinct().limit(inlist_max + 1).collect())
    try:
        hist = (s.read.option("basePath", hist_dir).parquet(hist_dir)
                .filter(F.col("batch_id") != batch_id))  # replay safety
        if len(key_rows) <= inlist_max:
            hist = hist.filter(
                F.col("bkey").isin([r["bkey"] for r in key_rows]))
        else:
            hist = hist.join(nb.select("bkey").distinct(), "bkey",
                             "left_semi")
        hist = hist.select("doc_id", "simhash", "bkey", "batch_id")
    except AnalysisException:
        hist = s.createDataFrame(
            [], "doc_id long, simhash string, bkey string, batch_id long")
    if bucket_cap:
        # a crash mid-vacuum of an earlier compaction can leave BOTH the
        # snapshot and some not-yet-deleted delta dirs readable until the
        # next sweep; pairs stay correct via distinct(), but duplicate
        # history rows must not consume bucket_cap slots (transient
        # over-rejection of new rows) — dedupe the PRUNED probe
        # (batch-sized, cheap) before the cap window, keeping each row's
        # EARLIEST batch_id so its arrival rank is preserved.  simhash is a
        # pure function of the doc text, so any surviving copy carries the
        # same value.
        hist = (hist.groupBy("doc_id", "bkey")
                .agg(F.min_by("simhash", "batch_id").alias("simhash"),
                     F.min("batch_id").alias("batch_id"))
                .select("doc_id", "simhash", "bkey", "batch_id"))
    left = hist.unionByName(nb)
    if bucket_cap:
        # write-time cap semantics: ARRIVAL order wins — earlier batches
        # rank first, so a batch row survives only if its bucket still has
        # room, and on-disk buckets can NEVER exceed cap (ordering by
        # doc_id alone breaks that invariant when a later batch carries
        # smaller ids: it would evict history rows from `left` that remain
        # in their already-written partitions while appending its own).
        # The window runs over the PRUNED union — O(|batch| x membership).
        w = Window.partitionBy("bkey").orderBy("batch_id", "doc_id")
        left = (left.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= bucket_cap).drop("_rn"))
    ham = F.bit_count(F.conv("sim_a", 2, 10).cast("long")
                      .bitwiseXOR(F.conv("sim_b", 2, 10).cast("long")))
    pairs = (left.select(F.col("doc_id").alias("a"),
                         F.col("simhash").alias("sim_a"), "bkey")
             .join(nb.select(F.col("doc_id").alias("b"),
                             F.col("simhash").alias("sim_b"), "bkey"), "bkey")
             .filter(F.col("a") != F.col("b"))
             .withColumn("hamming", ham.cast("long"))
             .filter(F.col("hamming") <= max_hamming)
             .select(F.least("a", "b").alias("a"),
                     F.greatest("a", "b").alias("b"), "hamming")
             .distinct().localCheckpoint())
    pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch_id={batch_id}")
    # only THIS batch's cap-surviving rows are ever appended (history rows
    # already live in their own partitions); batch_id is implied by the dir
    appended = (left.filter(F.col("batch_id") == batch_id)
                if bucket_cap else nb).drop("batch_id")
    done = [i for i in _local_partition_ids(hist_dir) if i < batch_id]
    if len(done) >= compact_every:
        # compaction sweep (amortized 1/compact_every, mirrors
        # canonicalize_fold): fold ALL history partitions + this batch into
        # ONE snapshot partition, then vacuum the old dirs and their
        # markers — bounding the per-batch file-listing/partition-discovery
        # cost that would otherwise grow O(#batches).  dropDuplicates
        # absorbs leftover rows from a crash mid-earlier-vacuum.  Write
        # order: snapshot, marker, THEN vacuum — a replay after a crash
        # before the marker still sees every old dir and recomputes
        # identically.
        full_hist = (s.read.option("basePath", hist_dir).parquet(hist_dir)
                     .filter(F.col("batch_id") != batch_id)
                     .select("doc_id", "simhash", "bkey"))
        snapshot = (full_hist.unionByName(appended)
                    .dropDuplicates(["doc_id", "bkey"]))
        snapshot.write.partitionBy("bkey").mode("overwrite") \
            .parquet(f"{hist_dir}/batch_id={batch_id}")
        _mark_committed(s, commits_dir, batch_id)
        for old_id in done:
            shutil.rmtree(f"{hist_dir}/batch_id={old_id}", ignore_errors=True)
            shutil.rmtree(f"{commits_dir}/batch_id={old_id}",
                          ignore_errors=True)
        return
    appended.write.partitionBy("bkey").mode("overwrite") \
        .parquet(f"{hist_dir}/batch_id={batch_id}")
    _mark_committed(s, commits_dir, batch_id)
