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


def stream_docs(spark: SparkSession, docs_dir: str) -> DataFrame:
    """File-source stream over driver-shaped documents parquet."""
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    raw = spark.readStream.schema(schema).parquet(docs_dir)
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
