"""JSONL / CSV ingestion with an explicit-schema, bad-row-preserving
contract — the crawl-dump entry point (web corpora arrive as gzipped
JSONL shards and CSV exports long before anyone converts them to
parquet).

Two rules a 100 TB ingest must not break:

* **Never infer schema.** Inference reads the data twice and pins the
  job to whatever the first shards happened to contain — a late shard
  with a wider type silently NULLs or fails the run. Callers pass the
  schema; the reader enforces it.
* **Never drop bad rows silently.** A malformed line becomes one row
  with the raw payload in ``_corrupt_record`` so the pipeline can
  count, sample, and quarantine it — at crawl scale "0.1% malformed"
  is a million documents someone must account for.

Mechanically these read via ``spark.read.text`` (splittable, scan-speed)
and parse with ``from_json`` / ``from_csv`` carrying the capture column
INSIDE the parse schema — deliberately NOT the DataSource readers' own
PERMISSIVE mode, whose corrupt column cannot be queried alone
(``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`` forces a
cache() workaround that is exactly wrong at ingest scale). Identical
capture semantics, no restriction, one map-only parse per line.
``split_bad`` separates the quarantine stream as two filters off the
same text scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["read_jsonl", "read_csv", "split_bad"]

#: the capture column (Spark's conventional name, pinned here so callers
#: and tests never hardcode the string twice)
CORRUPT_COL = "_corrupt_record"


def _parse_schema(schema: T.StructType | str) -> T.StructType:
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not predefine {CORRUPT_COL!r}")
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])


def _expand(raw: DataFrame, parsed) -> DataFrame:
    """Struct → columns; a line the parser rejected outright (NULL
    struct) still keeps its payload in the capture column."""
    return raw.select(parsed.alias("_r"), F.col("value")).select(
        F.col("_r.*"),
        F.when(F.col("_r").isNull(), F.col("value"))
        .otherwise(F.col(f"_r.{CORRUPT_COL}")).alias("_cr"),
    ).drop(CORRUPT_COL).withColumnRenamed("_cr", CORRUPT_COL)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    **options,
) -> DataFrame:
    """Line-delimited JSON with enforced schema + corrupt-line capture.

    A malformed or type-clashing line yields one row with the schema
    columns NULL (or partially parsed) and the raw line in
    ``_corrupt_record``; a WELL-FORMED line that merely omits fields
    yields NULLs for those fields and a NULL capture column — both
    contracts tested. Blank lines are structure, not data: skipped.
    Extra reader ``options`` pass through to ``from_json`` (e.g.
    ``{"timestampFormat": ...}``); mode/capture-column are pinned.
    """
    full = _parse_schema(schema)
    opts = dict(options)
    opts["mode"] = "PERMISSIVE"
    opts["columnNameOfCorruptRecord"] = CORRUPT_COL
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    return _expand(raw, F.from_json(F.col("value"), full, opts))


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
    **options,
) -> DataFrame:
    """CSV with enforced schema + corrupt-line capture (same contract as
    ``read_jsonl``). ``header=True`` drops EVERY line byte-equal to the
    schema's own header rendering — so per-shard headers in concatenated
    or multi-file dumps drop wherever they appear (the DataSource reader
    only skips each file's first line). The flip side: a DATA line that
    happens to equal the header drops too — with a typed schema such a
    line could only ever have parsed into the corrupt column anyway."""
    full = _parse_schema(schema)
    opts = dict(options)
    opts["mode"] = "PERMISSIVE"
    opts["columnNameOfCorruptRecord"] = CORRUPT_COL
    opts["sep"] = sep
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    if header:
        head_line = sep.join(f.name for f in full.fields
                             if f.name != CORRUPT_COL)
        raw = raw.where(F.col("value") != head_line)
    # from_csv takes a DDL string, not a StructType
    ddl = ", ".join(f"`{f.name}` {f.dataType.simpleString()}"
                    for f in full.fields)
    return _expand(raw, F.from_csv(F.col("value"), ddl, opts))


def split_bad(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows without the capture column, bad
    rows as (``_corrupt_record``) payloads. Two filters off one scan —
    quarantine first (counted/sampled/persisted), then feed ``clean``
    to the pipeline."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"frame has no {CORRUPT_COL!r} column — read it "
                         f"with read_jsonl/read_csv")
    clean = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    return clean, bad
