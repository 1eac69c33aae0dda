"""Alternative ingest formats for the documents table: JSONL and CSV.

The driver ships parquet, and production would read Iceberg — but a
web-scale corpus routinely arrives as JSONL (one record per line, the
Common-Crawl / LLM-training-dump lingua franca) or CSV exports.  These
readers normalize either format to the canonical documents schema so
everything downstream (`tables.derive_docs` onward) is format-agnostic.

Scale rules encoded here (the difference between one pass and two at
100 TB):

* **Explicit schema, never inference.**  `spark.read.json` without a
  schema runs a FULL extra scan of the input just to infer types (and
  `csv` with inferSchema does the same); at 100 TB that doubles the job.
  Both readers always pass the canonical schema.
* **PERMISSIVE + quarantine, never fail-the-job.**  A multi-TB dump has
  malformed lines; one bad record must not kill a 1000-executor run.
  Records that fail to parse land in a `_corrupt_record` column; callers
  get (good, quarantine) so bad lines are auditable, not silently dropped
  (CSV additionally needs the parsed-columns-all-null test below: its
  permissive mode can emit a row of nulls instead of flagging).
* **Splittability is a format property — know which you have.**  JSONL
  splits on newlines (JSON strings escape theirs as \\n), so scan
  parallelism comes from file splits exactly like parquet row-groups.
  CSV with RFC 4180 quoting can carry LITERAL newlines inside quoted
  fields, which forces `multiLine` parsing — and a multiLine CSV file is
  NOT splittable (one task per file).  The CSV reader defaults to
  multiLine=True for correctness on arbitrary text columns; pass
  multi_line=False for newline-free exports to get split parallelism
  back, or prefer JSONL for large text dumps (it has no such trade-off).
  Compressed inputs read transparently by extension (.gz, .zst, …)
  BUT gzip is not splittable: one .gz file = one task regardless of size,
  so a 1 TB single-file dump serializes its scan.  At scale, ship many
  moderate (~256 MB) compressed files or a splittable codec; the reader
  needs no change either way.

No reference analog (the FastAPI service ingests request payloads,
app/api/v1/linker.py:137); this is engine surface the Spark build needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# canonical documents schema (TESTDATA.md), plus the PERMISSIVE-mode
# corrupt-record column the readers strip before returning good rows
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])
_CORRUPT = "_corrupt_record"
_SCHEMA_WITH_CORRUPT = T.StructType(
    list(DOCUMENTS_SCHEMA.fields) + [T.StructField(_CORRUPT, T.StringType())])

_COLS = [f.name for f in DOCUMENTS_SCHEMA.fields]


def _split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good rows in canonical column order, quarantined raw records).

    A record is quarantined if the parser flagged it OR if every parsed
    column came back null (CSV permissive mode can produce all-null rows
    for garbage lines without setting the corrupt column).

    Audit-fidelity limitation (documented, by design): when the parser DID
    flag the record, `raw` is the original input text verbatim; for the
    CSV all-null shape the corrupt column is null, so `raw` degrades to
    the JSON of an all-null struct ('{}') — the original bytes are not
    recoverable from the parsed frame, and re-reading the file as text to
    recover them is not well-defined under multiLine (a logical record
    spans physical lines).  Counts stay exact either way; when byte-level
    audit of every bad record matters, ship JSONL (its corrupt column
    always carries the raw line) or newline-free CSV with
    multi_line=False."""
    all_null = F.lit(True)
    for c in _COLS:
        all_null = all_null & F.col(c).isNull()
    bad = F.col(_CORRUPT).isNotNull() | all_null
    good = parsed.filter(~bad).select(*_COLS)
    quarantine = parsed.filter(bad).select(
        F.coalesce(F.col(_CORRUPT),
                   F.to_json(F.struct(*_COLS))).alias("raw"))
    return good, quarantine


def read_documents_jsonl(spark: SparkSession,
                         path: str) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL documents dump. Returns (documents, quarantine)."""
    parsed = (spark.read
              .schema(_SCHEMA_WITH_CORRUPT)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", _CORRUPT)
              .json(path))
    return _split(parsed)


def read_documents_csv(spark: SparkSession, path: str, header: bool = True,
                       multi_line: bool = True
                       ) -> tuple[DataFrame, DataFrame]:
    """Read a CSV documents export. Returns (documents, quarantine).

    multi_line=True (default) parses RFC 4180 quoted fields with literal
    embedded newlines — correct for arbitrary text, but one task per file
    (see module doc); False restores split parallelism for exports whose
    text is known newline-free.

    Scan-parallelism guard (round 7): a multiLine read of FEWER FILES THAN
    CORES is a silently serialized scan (one huge CSV = one task at any
    cluster size), so the reader warns and repartitions the good rows to
    defaultParallelism — one bounded shuffle that un-serializes everything
    downstream (the scan itself cannot be parallelized post hoc; re-shard
    the export or ship JSONL to fix the scan)."""
    parsed = (spark.read
              .schema(_SCHEMA_WITH_CORRUPT)
              .option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", _CORRUPT)
              .option("header", "true" if header else "false")
              # quoted text fields; embedded quotes escaped by doubling
              # (RFC 4180, what df.write.csv emits)
              .option("multiLine", "true" if multi_line else "false")
              .option("escape", '"')
              .csv(path))
    good, quarantine = _split(parsed)
    if multi_line:
        n_files = len(parsed.inputFiles())
        cores = spark.sparkContext.defaultParallelism
        if 0 < n_files < cores:
            import warnings
            warnings.warn(
                f"multiLine CSV scan of {path!r} has {n_files} file(s) for "
                f"{cores} cores — multiLine files are not splittable, so "
                f"the scan serializes to {n_files} task(s); repartitioning "
                f"parsed rows to {cores} for downstream parallelism. Ship "
                f"many moderate files, multi_line=False, or JSONL to "
                f"parallelize the scan itself.",
                stacklevel=2)
            good = good.repartition(cores)
    return good, quarantine


def write_documents_jsonl(df: DataFrame, path: str) -> None:
    df.select(*_COLS).write.mode("overwrite").json(path)


def write_documents_csv(df: DataFrame, path: str) -> None:
    (df.select(*_COLS).write.mode("overwrite")
     .option("header", "true").option("escape", '"').csv(path))
