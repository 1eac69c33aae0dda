"""Streaming ingest: availableNow file-source run must equal the batch
pipeline's entities on the same corpus, and resume incrementally."""

import duckdb
from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_available_now_ingest_matches_batch(spark, tmp_path):
    from entity_extractor_linker_api_v2_spark.plans.pipeline import run_pipeline
    from entity_extractor_linker_api_v2_spark.streaming.ingest import run_ingest

    docs_dir, out_dir, ck_dir = (str(tmp_path / d) for d in ("docs", "out", "ck"))
    spark.read.parquet(f"{SF_SMALL}/documents.parquet").write.parquet(docs_dir)

    run_ingest(spark, docs_dir, out_dir, ck_dir)
    got = spark.read.parquet(out_dir)
    want = run_pipeline(spark, SF_SMALL, fused=True)["entities"]
    cols = ["url", "label", "status", "wikidata_id", "label_de"]
    assert {tuple(r) for r in got.select(cols).collect()} == \
        {tuple(r) for r in want.select(cols).collect()}

    # incremental restart: appending new files processes ONLY the delta
    extra = duckdb.connect().execute(
        f"SELECT doc_id + 900000 AS doc_id, text, lang, source, n_chars "
        f"FROM '{SF_SMALL}/documents.parquet' LIMIT 50").fetchdf()
    spark.createDataFrame(extra).write.mode("append").parquet(docs_dir)
    n_before = got.count()
    run_ingest(spark, docs_dir, out_dir, ck_dir)
    n_after = spark.read.parquet(out_dir).count()
    assert n_after > n_before
    assert n_after - n_before < n_before  # only the delta was processed


def test_windowed_watermarked_counts(spark, tmp_path):
    """Stateful streaming: watermarked 1h-window counts over a file stream
    must equal the batch groupBy on the same data after availableNow."""
    import pyspark.sql.functions as F
    from entity_extractor_linker_api_v2_spark.streaming.ingest import (
        stream_docs, windowed_entity_counts)

    docs_dir = str(tmp_path / "docs")
    spark.read.parquet(f"{SF_SMALL}/documents.parquet").write.parquet(docs_dir)

    stream = stream_docs(spark, docs_dir).withColumn("type", F.col("lang"))
    agg = windowed_entity_counts(stream, watermark="2 hours", window="1 hour")
    q = (agg.writeStream.format("memory").queryName("win_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {(r.win.start, r.type): r.cnt
           for r in spark.sql("select * from win_counts").collect()}
    from entity_extractor_linker_api_v2_spark.sources.tables import docs_table
    batch = (docs_table(spark, SF_SMALL, with_html=False)
             .groupBy(F.window("warc_ts", "1 hour").alias("win"),
                      F.col("lang").alias("type"))
             .agg(F.count("*").alias("cnt")))
    want = {(r.win.start, r.type): r.cnt for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: completed sessions emitted by the
    stream must equal the batch q32 sessionization, minus each user's final
    (still-open, held-in-state) session."""
    from entity_extractor_linker_api_v2_spark.plans.queries import q_sessionize
    from entity_extractor_linker_api_v2_spark.streaming.ingest import sessionize_stream

    ev_dir = str(tmp_path / "events")
    spark.read.parquet(f"{SF_SMALL}/events.parquet").write.parquet(ev_dir)
    schema = spark.read.parquet(ev_dir).schema

    stream = spark.readStream.schema(schema).parquet(ev_dir)
    # huge watermark delay => no event-time timeouts fire, so the stream
    # emits exactly the sessions CLOSED by a later event — each user's final
    # session is still open in state (what the batch job cannot express)
    q = (sessionize_stream(stream, watermark="87600 hours")
         .writeStream.format("memory")
         .queryName("sess").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r.user_id, r.session_no):
           (r.n_events, r.session_start.replace(microsecond=0))
           for r in spark.sql("select * from sess").collect()}

    batch = q_sessionize(spark, SF_SMALL).collect()
    last = {}
    for r in batch:
        last[r.user_id] = max(last.get(r.user_id, 0), r.session_no)
    import datetime as dt
    want = {(r.user_id, r.session_no):
            (r.n_events,
             dt.datetime.strptime(r.session_start, "%Y-%m-%d %H:%M:%S"))
            for r in batch if r.session_no < last[r.user_id]}
    assert len(got) > 0
    assert got == want


def test_sessionize_fn_cross_batch_disorder():
    """An out-of-order event arriving in a LATER micro-batch (above the
    watermark) must join the open session, not split it: `last` is monotone
    max, `start` monotone min.  Driven directly through the update fn with a
    fake GroupState (no stream needed)."""
    import pandas as pd

    from entity_extractor_linker_api_v2_spark.streaming.ingest import _sessionize_fn

    class FakeState:
        def __init__(self):
            self._v, self.hasTimedOut = None, False

        @property
        def exists(self):
            return self._v is not None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v

        def remove(self):
            self._v = None

        def setTimeoutTimestamp(self, _):
            pass

    def batch(*secs):
        return [pd.DataFrame({"ts": pd.to_datetime(list(secs), unit="s")})]

    st = FakeState()
    # batch 1: events at t=1000s and t=1600s (one open session)
    out1 = list(_sessionize_fn((7,), batch(1000, 1600), st))
    assert sum(len(o) for o in out1) == 0
    # batch 2: late event at t=1200s (< last=1600) plus t=1700s
    out2 = list(_sessionize_fn((7,), batch(1700, 1200), st))
    assert sum(len(o) for o in out2) == 0  # still ONE open session
    sess_no, n, last_us, start_us = st.get
    assert (sess_no, n) == (1, 4)
    assert last_us == 1700 * 1_000_000      # not dragged back to 1200
    assert start_us == 1000 * 1_000_000
    # batch 3: t=4000s closes the session (gap > 1800s) -> emitted with all 4
    out3 = pd.concat(list(_sessionize_fn((7,), batch(4000), st)))
    assert len(out3) == 1 and int(out3.iloc[0]["n_events"]) == 4


def test_dedup_stream_drops_within_watermark(spark, tmp_path):
    """Streaming exact dedup: duplicates inside the watermark horizon are
    dropped (first-seen wins), distinct docs all pass; result equals the
    batch distinct-fingerprint count."""
    import pyspark.sql.functions as F

    from entity_extractor_linker_api_v2_spark.streaming.ingest import (
        dedup_stream, stream_docs)

    docs_dir, out_dir, ck_dir = (str(tmp_path / d) for d in ("docs", "out", "ck"))
    base = spark.read.parquet(f"{SF_SMALL}/documents.parquet").limit(100)
    dups = base.limit(30).withColumn("doc_id", F.col("doc_id") + 700000)
    base.unionByName(dups).write.parquet(docs_dir)

    q = (dedup_stream(stream_docs(spark, docs_dir))
         .writeStream.format("parquet")
         .option("path", out_dir).option("checkpointLocation", ck_dir)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = spark.read.parquet(out_dir)
    assert got.count() == 100                       # 30 dups dropped
    assert got.select("fp").distinct().count() == 100


def test_canonicalize_stream_matches_batch(spark, tmp_path):
    """Streaming incremental canonicalization: fold micro-batches of edges
    into the persisted component state via merge_components; after draining
    the corpus (forced into MULTIPLE micro-batches via maxFilesPerTrigger),
    the state must equal the one-shot batch canonicalization of the same
    corpus — same (node, comp) pairs, comp = component-minimum member."""
    from entity_extractor_linker_api_v2_spark.operators.canonicalize import (
        canonical_entities)
    from entity_extractor_linker_api_v2_spark.plans.pipeline import run_pipeline
    from entity_extractor_linker_api_v2_spark.streaming.ingest import (
        canonicalize_stream)

    docs_dir, state_dir, ck_dir = (str(tmp_path / d) for d in ("docs", "state", "ck"))
    # split the corpus into 4 files so maxFilesPerTrigger=1 gives 4 batches
    (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
     .repartition(4).write.parquet(docs_dir))

    canonicalize_stream(spark, docs_dir, state_dir, ck_dir,
                        max_files_per_trigger=1)

    # the maintenance must have REALLY been incremental: one committed
    # offset per micro-batch in the checkpoint
    import os
    n_batches = len([f for f in os.listdir(os.path.join(ck_dir, "offsets"))
                     if not f.startswith(".")])
    assert n_batches >= 4, n_batches

    from entity_extractor_linker_api_v2_spark.streaming.ingest import read_components
    got = {(r["node"], r["comp"])
           for r in read_components(spark, state_dir).collect()}
    want_entities = run_pipeline(spark, SF_SMALL, fused=True)["entities"]
    want = {(r["node"], r["comp"])
            for r in canonical_entities(want_entities).select("node", "comp").collect()}
    assert got == want and len(got) > 0


def test_neardup_stream_matches_batch(spark, tmp_path):
    """Streaming near-dup maintenance: pairs accumulated across 4 real
    micro-batches (new docs band-joined against batch + history) must equal
    the one-shot batch simhash_near_dups over the full corpus — every true
    pair emitted exactly once, at the batch where its later member arrives."""
    from entity_extractor_linker_api_v2_spark.operators import dedup
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_stream

    docs_dir, state_dir, pairs_dir, ck_dir = (
        str(tmp_path / d) for d in ("docs", "state", "pairs", "ck"))
    (spark.read.parquet(f"{SF_SMALL}/documents.parquet")
     .repartition(4).write.parquet(docs_dir))

    # bucket_cap=0 is the EXPLICIT exactness mode: the production default
    # (64, matching dedup.BUCKET_CAP) legitimately diverges from one-shot
    # on over-cap buckets, so the equivalence contract is cap-0 vs cap-0
    neardup_stream(spark, docs_dir, state_dir, pairs_dir, ck_dir,
                   bucket_cap=0, max_files_per_trigger=1)

    got = [(r["a"], r["b"], r["hamming"])
           for r in spark.read.parquet(pairs_dir).collect()]
    assert len(got) == len(set(got)), "a pair was emitted more than once"
    want = {(r["a"], r["b"], r["hamming"])
            for r in dedup.simhash_near_dups(
                spark.read.parquet(f"{SF_SMALL}/documents.parquet"),
                bucket_cap=0).collect()}
    assert set(got) == want and len(want) > 0


def test_neardup_fold_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: a batch replayed after a crash between
    the pairs write and the checkpoint commit must not double-emit pairs or
    double-append history.  Drives neardup_fold directly: fold batch 0 and
    batch 1, then replay batch 1 twice — once with its commit marker intact
    (skipped outright) and once with the marker removed, simulating a crash
    just before commit (per-batch-dir overwrite rewrites identical
    content)."""
    import shutil

    from entity_extractor_linker_api_v2_spark.operators import dedup
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    state_dir, pairs_dir = str(tmp_path / "state"), str(tmp_path / "pairs")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet") \
        .select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    # explicit cap=0: this test's oracle is the UNCAPPED one-shot batch
    neardup_fold(spark, b0, 0, state_dir, pairs_dir, bucket_cap=0)
    neardup_fold(spark, b1, 1, state_dir, pairs_dir, bucket_cap=0)

    def snapshot():
        pairs = sorted((r["a"], r["b"], r["hamming"])
                       for r in spark.read.parquet(pairs_dir).collect())
        hist = sorted((r["doc_id"], r["simhash"], r["bkey"], r["batch_id"])
                      for r in spark.read.parquet(f"{state_dir}/hist").collect())
        return pairs, hist

    want_pairs, want_hist = snapshot()
    assert len(want_pairs) == len(set(want_pairs)) and len(want_pairs) > 0
    want = {(r["a"], r["b"], r["hamming"])
            for r in dedup.simhash_near_dups(docs, bucket_cap=0).collect()}
    assert set(want_pairs) == want

    # replay 1: marker intact -> skipped, nothing changes
    neardup_fold(spark, b1, 1, state_dir, pairs_dir, bucket_cap=0)
    assert snapshot() == (want_pairs, want_hist)
    # replay 2: crash before commit (marker gone) -> rewrite, still equal
    shutil.rmtree(f"{state_dir}/commits/batch_id=1")
    neardup_fold(spark, b1, 1, state_dir, pairs_dir, bucket_cap=0)
    assert snapshot() == (want_pairs, want_hist)


def test_neardup_fold_history_scan_is_partition_pruned(spark, tmp_path):
    """The history side of the probe must be a partition-pruned scan on the
    batch's band keys — O(batch x membership) I/O, never a full-history
    re-banding.  Asserts at the file level: a probe-shaped filter reads
    strictly fewer files than the full history when the probe touches a
    subset of the band-key partitions."""
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    state_dir, pairs_dir = str(tmp_path / "state"), str(tmp_path / "pairs")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet") \
        .select("doc_id", "text")
    neardup_fold(spark, docs, 0, state_dir, pairs_dir)

    hist = spark.read.option("basePath", f"{state_dir}/hist") \
        .parquet(f"{state_dir}/hist")
    all_keys = [r["bkey"] for r in hist.select("bkey").distinct().collect()]
    assert len(all_keys) > 2
    probe = hist.filter(F.col("bkey").isin(all_keys[:1]))
    # bkey is a PARTITION column, so the isin probe must appear as a
    # partition filter on the scan (pruned at file listing, zero data read
    # outside the probed buckets) — not as a post-scan data filter
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scan_line = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "bkey" in scan_line.split("PartitionFilters")[1].split("]")[0], plan
    # and the probed relation actually shrinks to the bucket's membership
    assert 0 < probe.count() < hist.count()


def test_canonicalize_fold_replay_and_compaction(spark, tmp_path):
    """canonicalize_fold: (a) replay with and without the commit marker is
    idempotent; (b) state writes are per-batch DELTAS, not full rewrites;
    (c) after compact_every batches the fold snapshots + vacuums and
    read_components still equals the full batch recompute."""
    import os
    import shutil

    from entity_extractor_linker_api_v2_spark.operators.canonicalize import (
        connected_components_star)
    from entity_extractor_linker_api_v2_spark.streaming.ingest import (
        canonicalize_fold, read_components)

    state_dir = str(tmp_path / "state")
    chain = [(f"n{i}", f"n{i+1}") for i in range(12)]  # one growing chain

    def edges_df(i):
        return spark.createDataFrame([chain[i]], "a string, b string")

    for i in range(3):
        canonicalize_fold(spark, edges_df(i), i, state_dir, compact_every=5)
    got3 = {(r["node"], r["comp"])
            for r in read_components(spark, state_dir).collect()}
    want3 = {(r["node"], r["comp"]) for r in connected_components_star(
        spark.createDataFrame(chain[:3], "a string, b string")).collect()}
    assert got3 == want3

    # (a) replays
    before = got3
    canonicalize_fold(spark, edges_df(2), 2, state_dir, compact_every=5)
    shutil.rmtree(f"{state_dir}/commits/batch_id=2")
    canonicalize_fold(spark, edges_df(2), 2, state_dir, compact_every=5)
    got = {(r["node"], r["comp"])
           for r in read_components(spark, state_dir).collect()}
    assert got == before

    # (b) delta-sized writes: batch 2 touched only the chain prefix; its
    # partition must hold far fewer rows than the full node set
    d2 = spark.read.parquet(f"{state_dir}/comps/batch_id=2")
    assert d2.count() <= 4, d2.count()

    # (c) push past compact_every -> snapshot + vacuum of older deltas
    for i in range(3, 7):
        canonicalize_fold(spark, edges_df(i), i, state_dir, compact_every=5)
    dirs = [d for d in os.listdir(f"{state_dir}/comps")
            if d.startswith("batch_id=")]
    assert len(dirs) < 7, dirs  # older deltas vacuumed at the snapshot batch
    got7 = {(r["node"], r["comp"])
            for r in read_components(spark, state_dir).collect()}
    want7 = {(r["node"], r["comp"]) for r in connected_components_star(
        spark.createDataFrame(chain[:7], "a string, b string")).collect()}
    assert got7 == want7


def test_neardup_fold_write_time_cap_bounds_state(spark, tmp_path):
    """bucket_cap>0: the history NEVER holds more than cap rows per band
    bucket (write-time capping), every emitted pair is still a true pair,
    and the divergence from the uncapped one-shot is one-sided — capping
    only DROPS pairs, it never invents them (the documented
    incremental≠one-shot trade at cluster scale)."""
    from entity_extractor_linker_api_v2_spark.operators import dedup
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    state_dir, pairs_dir = str(tmp_path / "state"), str(tmp_path / "pairs")
    boiler = "the same boilerplate navigation template page " * 8
    docs = spark.createDataFrame([(i, boiler) for i in range(6)],
                                 "doc_id long, text string")
    b0 = docs.filter(F.col("doc_id") < 3)
    b1 = docs.filter(F.col("doc_id") >= 3)
    neardup_fold(spark, b0, 0, state_dir, pairs_dir, bucket_cap=2)
    neardup_fold(spark, b1, 1, state_dir, pairs_dir, bucket_cap=2)

    per_bucket = (spark.read.parquet(f"{state_dir}/hist")
                  .groupBy("bkey").count().collect())
    assert all(r["count"] <= 2 for r in per_bucket) and len(per_bucket) > 0

    got = {(r["a"], r["b"], r["hamming"])
           for r in spark.read.parquet(pairs_dir).collect()}
    want_uncapped = {(r["a"], r["b"], r["hamming"])
                     for r in dedup.simhash_near_dups(docs, bucket_cap=0).collect()}
    assert got < want_uncapped  # strictly fewer: capping drops, never invents
    assert len(got) > 0


def test_neardup_fold_cap_holds_under_non_monotone_doc_ids(spark, tmp_path):
    """The cap invariant must hold even when a LATER batch carries SMALLER
    doc_ids than persisted history: a doc_id-ordered cap window would evict
    history rows from the in-memory union (which stay in their on-disk
    partitions regardless) while appending the batch's rows, growing the
    bucket past the cap.  The (batch_id, doc_id) arrival ordering keeps
    earlier batches first, so full buckets reject the new rows."""
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    state_dir, pairs_dir = str(tmp_path / "state"), str(tmp_path / "pairs")
    boiler = "the same boilerplate navigation template page " * 8
    b0 = spark.createDataFrame([(10, boiler), (11, boiler)],
                               "doc_id long, text string")
    b1 = spark.createDataFrame([(1, boiler), (2, boiler)],
                               "doc_id long, text string")
    neardup_fold(spark, b0, 0, state_dir, pairs_dir, bucket_cap=2)
    neardup_fold(spark, b1, 1, state_dir, pairs_dir, bucket_cap=2)

    per_bucket = (spark.read.parquet(f"{state_dir}/hist")
                  .groupBy("bkey").count().collect())
    assert all(r["count"] <= 2 for r in per_bucket) and len(per_bucket) > 0
    # the full buckets belong to batch 0 — batch 1's rows were rejected
    hist_ids = {r["doc_id"]
                for r in spark.read.parquet(f"{state_dir}/hist").collect()}
    assert hist_ids == {10, 11}


def test_neardup_fold_compaction_bounds_partitions(spark, tmp_path):
    """Every compact_every batches the fold snapshots all history partitions
    into one and vacuums older dirs + commit markers — the per-batch listing
    cost stays O(compact_every), and the accumulated pairs still equal the
    one-shot batch computation."""
    import os

    from entity_extractor_linker_api_v2_spark.operators import dedup
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    state_dir, pairs_dir = str(tmp_path / "state"), str(tmp_path / "pairs")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet") \
        .select("doc_id", "text")
    n_batches = 6
    for i in range(n_batches):
        neardup_fold(spark, docs.filter(F.col("doc_id") % n_batches == i),
                     i, state_dir, pairs_dir, bucket_cap=0, compact_every=2)

    def dirs(p):
        return sorted(d for d in os.listdir(p) if d.startswith("batch_id="))

    # compaction fired: far fewer live partitions than batches, markers too
    assert len(dirs(f"{state_dir}/hist")) <= 3
    assert len(dirs(f"{state_dir}/commits")) <= 3
    # and the result is still exactly the one-shot near-dup set
    got = {(r["a"], r["b"], r["hamming"])
           for r in spark.read.parquet(pairs_dir).collect()}
    want = {(r["a"], r["b"], r["hamming"])
            for r in dedup.simhash_near_dups(docs, bucket_cap=0).collect()}
    assert got == want and len(want) > 0
    # history content survived compaction intact (one row per doc per band)
    hist = spark.read.parquet(f"{state_dir}/hist")
    assert hist.count() == hist.select("doc_id", "bkey").distinct().count()


import pytest


@pytest.mark.parametrize("seed,k", [(7, 3), (23, 5), (101, 2)])
def test_neardup_fold_matches_batch_under_random_splits(spark, tmp_path,
                                                        seed, k):
    """Fold ≡ one-shot must hold for ARBITRARY batch assignments, not just
    the even/odd and modulo splits the fixed tests use: hash-split the
    corpus into k seed-dependent batches (uneven sizes, near-dup members
    landing in any relative order) and assert the accumulated pairs equal
    the uncapped one-shot near-dup set exactly."""
    from entity_extractor_linker_api_v2_spark.operators import dedup
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    state_dir = str(tmp_path / "state")
    pairs_dir = str(tmp_path / "pairs")
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet") \
        .select("doc_id", "text")
    bucket = F.crc32(F.concat_ws("_", F.col("doc_id").cast("string"),
                                 F.lit(str(seed)))) % k
    sizes = []
    for i in range(k):
        b = docs.filter(bucket == i)
        sizes.append(b.count())
        neardup_fold(spark, b, i, state_dir, pairs_dir, bucket_cap=0)
    assert sum(sizes) == docs.count() and min(sizes) > 0

    got = [(r["a"], r["b"], r["hamming"])
           for r in spark.read.parquet(pairs_dir).collect()]
    assert len(got) == len(set(got)), "a pair was emitted more than once"
    want = {(r["a"], r["b"], r["hamming"])
            for r in dedup.simhash_near_dups(docs, bucket_cap=0).collect()}
    assert set(got) == want and len(want) > 0


@pytest.mark.parametrize("seed", [7, 23, 101])
def test_canonicalize_fold_matches_batch_under_random_splits(spark, tmp_path,
                                                             seed):
    """Incremental CC must converge to the one-shot components for any
    edge-arrival order: build a random graph (chains, a star hub, cross
    links, singleton-joining edges), shuffle its edges with a seeded RNG
    into uneven batches, fold them in, and assert the state equals the
    one-shot star-CC over the union — same (node, comp) pairs, comp = the
    component minimum regardless of which member arrived first."""
    import random

    from entity_extractor_linker_api_v2_spark.operators.canonicalize import (
        connected_components_star)
    from entity_extractor_linker_api_v2_spark.streaming.ingest import (
        canonicalize_fold, read_components)

    rng = random.Random(seed)
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(0, 8)]       # chain
    edges += [(f"hub", f"m{i}") for i in range(5)]                      # star
    edges += [(f"n{rng.randrange(9):02d}", f"m{rng.randrange(5)}")]     # cross
    edges += [(f"z{i}", f"z{i}x") for i in range(3)]                    # pairs
    rng.shuffle(edges)
    cuts = sorted(rng.sample(range(1, len(edges)), 3))
    batches = [edges[a:b] for a, b in
               zip([0] + cuts, cuts + [len(edges)])]

    state_dir = str(tmp_path / "state")
    for i, batch in enumerate(batches):
        canonicalize_fold(
            spark, spark.createDataFrame(batch, "a string, b string"),
            i, state_dir)

    got = {(r["node"], r["comp"])
           for r in read_components(spark, state_dir).collect()}
    want = {(r["node"], r["comp"]) for r in connected_components_star(
        spark.createDataFrame(edges, "a string, b string")).collect()}
    assert got == want and len(got) > 0


def test_canonicalize_fold_empty_edge_batch(spark, tmp_path):
    """A micro-batch whose documents yield NO resolution edges (nothing
    linkable) must fold cleanly: state unchanged, batch still marked
    committed (so a replay skips), and the empty delta partition must not
    break the latest-wins reader."""
    import os

    from entity_extractor_linker_api_v2_spark.streaming.ingest import (
        canonicalize_fold, read_components)

    state_dir = str(tmp_path / "state")
    empty = spark.createDataFrame([], "a string, b string")
    # batch 0: empty edges into EMPTY state — reader still returns nothing
    canonicalize_fold(spark, empty, 0, state_dir)
    assert read_components(spark, state_dir).count() == 0
    assert os.path.isdir(f"{state_dir}/commits/batch_id=0")

    # batch 1 builds real state; batch 2 is empty again — state unchanged
    edges = spark.createDataFrame([("x", "y"), ("y", "z")],
                                  "a string, b string")
    canonicalize_fold(spark, edges, 1, state_dir)
    want = {(r["node"], r["comp"])
            for r in read_components(spark, state_dir).collect()}
    assert want == {("x", "x"), ("y", "x"), ("z", "x")}
    canonicalize_fold(spark, empty, 2, state_dir)
    got = {(r["node"], r["comp"])
           for r in read_components(spark, state_dir).collect()}
    assert got == want
    assert os.path.isdir(f"{state_dir}/commits/batch_id=2")


def test_neardup_fold_semijoin_probe_matches_inlist(spark, tmp_path):
    """Fat-batch guard (round-5 advice): above `inlist_max` distinct band
    keys the history probe switches from an IN-literal partition-pruned
    scan to a semi-join.  Both probe shapes must produce identical pairs
    AND identical history state across a multi-batch fold sequence."""
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet") \
        .select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    def run(tag, **kw):
        state, pairs = str(tmp_path / f"s_{tag}"), str(tmp_path / f"p_{tag}")
        neardup_fold(spark, b0, 0, state, pairs, **kw)
        neardup_fold(spark, b1, 1, state, pairs, **kw)
        got_pairs = sorted((r["a"], r["b"], r["hamming"])
                           for r in spark.read.parquet(pairs).collect())
        hist = sorted((r["doc_id"], r["simhash"], r["bkey"], r["batch_id"])
                      for r in spark.read.parquet(f"{state}/hist").collect())
        return got_pairs, hist

    want = run("inlist")                    # default: IN-literal probe
    got = run("semijoin", inlist_max=0)     # force the semi-join probe
    assert got == want and len(want[0]) > 0


def test_neardup_fold_fat_batch_completes(spark, tmp_path):
    """A catch-up batch far past NEARDUP_INLIST_MAX distinct keys (the
    one-giant-availableNow-batch shape) must complete without a
    driver-collected key set: 100k docs in ONE fold, with planted
    duplicates whose pairs must all be found in a follow-up batch."""
    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    state_dir, pairs_dir = str(tmp_path / "state"), str(tmp_path / "pairs")
    # 100k short unique-ish docs: id-dependent word soup, 4 bands each ->
    # ~400k distinct keys >> inlist_max
    base = spark.range(100_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("dok text nummer "), F.col("id").cast("string"),
                 F.lit(" inhalt "), F.conv(F.col("id"), 10, 36),
                 F.lit(" ende "), F.conv(F.col("id") * 7919, 10, 29))
        .alias("text"))
    # cap=0: 100k docs over ~1k band buckets would evict most originals at
    # the default write-time cap; this test exercises the fat-batch probe
    # shape, so history must retain every planted original
    neardup_fold(spark, base, 0, state_dir, pairs_dir, bucket_cap=0,
                 inlist_max=1000)
    # follow-up batch: 50 exact clones of existing docs -> each must pair
    # with its original via the (semi-join or in-list) history probe
    clones = (base.filter(F.col("doc_id") % 2000 == 0)
              .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))
    neardup_fold(spark, clones, 1, state_dir, pairs_dir, bucket_cap=0,
                 inlist_max=1000)
    pairs = spark.read.parquet(pairs_dir)
    got = {(r["a"], r["b"]) for r in
           pairs.filter(F.col("hamming") == 0).collect()}
    want = {(i, i + 1_000_000) for i in range(0, 100_000, 2000)}
    assert want <= got


def test_neardup_fold_cap_ignores_crash_duplicate_history(spark, tmp_path):
    """A crash mid-vacuum leaves duplicate history rows (snapshot + stale
    delta dirs) until the next sweep; the write-time bucket cap must not
    let those duplicates consume cap slots.  Simulates the leftover by
    copying a history partition to a second batch_id, then folds a new doc
    with bucket_cap=2: the new doc's rows must still be appended (one
    logical occupant + the new doc fit the cap), not crowded out by the
    duplicate."""
    import shutil

    from entity_extractor_linker_api_v2_spark.streaming.ingest import neardup_fold

    state_dir, pairs_dir = str(tmp_path / "state"), str(tmp_path / "pairs")
    mk = lambda i, t: spark.createDataFrame([(i, t)], "doc_id long, text string")
    text = "identischer inhalt fuer alle drei dokumente im selben bucket"
    neardup_fold(spark, mk(1, text), 0, state_dir, pairs_dir, bucket_cap=2)
    # crash leftover: batch 0's rows appear AGAIN under batch_id=1
    shutil.copytree(f"{state_dir}/hist/batch_id=0",
                    f"{state_dir}/hist/batch_id=1")
    neardup_fold(spark, mk(2, text), 2, state_dir, pairs_dir, bucket_cap=2)
    hist_docs = {r["doc_id"] for r in
                 spark.read.parquet(f"{state_dir}/hist").collect()}
    assert 2 in hist_docs, \
        "crash-duplicate history rows consumed the new doc's cap slot"
    got = {(r["a"], r["b"]) for r in spark.read.parquet(pairs_dir).collect()}
    assert (1, 2) in got


def test_merge_components_delta_no_broadcast_path_matches(spark, monkeypatch):
    """Fat-batch guard: above DELTA_BROADCAST_MAX_NODES batch nodes the
    delta merge drops its forced broadcasts (AQE picks the strategy); the
    result must be identical to the broadcast-hinted path."""
    from entity_extractor_linker_api_v2_spark.operators import canonicalize as C

    comps = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "c"), ("d", "d")],
        "node string, comp string")
    edges = spark.createDataFrame([("b", "c"), ("e", "d")],
                                  "a string, b string")
    want = sorted(tuple(r) for r in
                  C.merge_components_delta(comps, edges).collect())
    monkeypatch.setattr(C, "DELTA_BROADCAST_MAX_NODES", 0)
    got = sorted(tuple(r) for r in
                 C.merge_components_delta(comps, edges).collect())
    assert got == want and len(want) > 0
