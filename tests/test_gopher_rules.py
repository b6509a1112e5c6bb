"""quality.gopher_rules: full DuckDB replay of the seven MassiveText
rule metrics + booleans over the fixture corpus with planted
rule-violating documents, threshold knobs, and the map-only plan pin."""

import duckdb

from pyspark.sql import functions as F

from anomalyzer_spark.functions import quality
from anomalyzer_spark.plans import assert_plan


def _planted(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    extra = spark.createDataFrame([
        (1_000_001, "short text"),                          # word count
        (1_000_002, " ".join(["a"] * 80)),                  # mean word len
        (1_000_003, " ".join(["ok#word..."] * 60)),         # symbols
        (1_000_004, "\n".join(["• bullet line"] * 10)),     # bullets
        (1_000_005, "\n".join(["trailing..."] * 10)),       # ellipses
        (1_000_006, " ".join(["1234"] * 60)),               # alpha words
        (1_000_007, " ".join(["zig", "zag"] * 40)),         # stop words
        (1_000_008, "the be to of and that have with "
         + "good words " * 30),                             # passes all
    ], "doc_id long, text string")
    return docs.unionByName(extra)


def test_duckdb_parity_and_planted_rules(spark, sf_dir):
    d = _planted(spark, sf_dir)
    got = {r["doc_id"]: tuple(r)[1:] for r in
           quality.gopher_rules(d).collect()}
    con = duckdb.connect()
    con.execute(f"CREATE VIEW base AS SELECT * FROM "
                f"read_parquet('{sf_dir}/documents.parquet')")
    rows = d.where(F.col("doc_id") >= 1_000_000).collect()
    con.execute("CREATE VIEW extra AS SELECT * FROM (VALUES "
                + ",".join("(%d, %s)" % (r["doc_id"],
                                         "'" + r["text"].replace("'", "''")
                                         + "'") for r in rows)
                + ") t(doc_id, text)")
    want = {r[0]: tuple(r)[1:] for r in con.execute(r"""
WITH d AS (SELECT doc_id, text FROM base
           UNION ALL SELECT doc_id, text FROM extra),
st AS (
  SELECT doc_id,
    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS w,
    string_split(text, chr(10)) AS l,
    coalesce(len(regexp_extract_all(text, '#|\.\.\.')), 0) AS nsym
  FROM d),
m AS (
  SELECT doc_id,
    len(w)::BIGINT AS n_words,
    round(list_sum(list_transform(w, x -> length(x)))::DOUBLE
          / greatest(len(w), 1), 6) AS mean_word_len,
    round(nsym / greatest(len(w), 1), 6) AS symbol_word_ratio,
    round(len(list_filter(l, x -> regexp_matches(x,
      '^[ \t]*(•|\*|-)')))::DOUBLE / greatest(len(l), 1), 6)
      AS bullet_line_ratio,
    round(len(list_filter(l, x -> regexp_matches(x,
      '(\.\.\.|…)[ \t]*$')))::DOUBLE / greatest(len(l), 1), 6)
      AS ellipsis_line_ratio,
    round(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
          / greatest(len(w), 1), 6) AS alpha_word_ratio,
    len(list_intersect(list_transform(w, x -> lower(x)),
        ['the','be','to','of','and','that','have','with']))::INT
      AS n_stop_words
  FROM st)
SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
  bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio, n_stop_words,
  n_words BETWEEN 50 AND 100000 AS r_word_count,
  mean_word_len BETWEEN 3.0 AND 10.0 AS r_mean_word_len,
  symbol_word_ratio <= 0.1 AS r_symbol_ratio,
  bullet_line_ratio <= 0.9 AS r_bullet_lines,
  ellipsis_line_ratio <= 0.3 AS r_ellipsis_lines,
  alpha_word_ratio >= 0.8 AS r_alpha_words,
  n_stop_words >= 2 AS r_stop_words,
  (n_words BETWEEN 50 AND 100000) AND
  (mean_word_len BETWEEN 3.0 AND 10.0) AND
  symbol_word_ratio <= 0.1 AND bullet_line_ratio <= 0.9 AND
  ellipsis_line_ratio <= 0.3 AND alpha_word_ratio >= 0.8 AND
  n_stop_words >= 2 AS gopher_pass
FROM m""").fetchall()}
    assert got == want and len(got) == 508
    # each planted doc fails exactly its targeted rule (plus pass doc)
    fails = {
        1_000_001: "r_word_count", 1_000_002: "r_mean_word_len",
        1_000_003: "r_symbol_ratio", 1_000_004: "r_bullet_lines",
        1_000_005: "r_ellipsis_lines", 1_000_006: "r_alpha_words",
        1_000_007: "r_stop_words",
    }
    rep = {r["doc_id"]: r for r in quality.gopher_rules(
        d.where(F.col("doc_id") >= 1_000_000)).collect()}
    for did, rule in fails.items():
        assert rep[did][rule] is False, (did, rule)
        assert rep[did]["gopher_pass"] is False
    assert rep[1_000_008]["gopher_pass"] is True
    # thresholds are knobs: loosening the violated rule flips the doc
    loose = {r["doc_id"]: r for r in quality.gopher_rules(
        d.where(F.col("doc_id") == 1_000_001), min_words=1).collect()}
    assert loose[1_000_001]["r_word_count"] is True


def test_map_only_plan(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert_plan(quality.gopher_rules(d), max_exchanges=0,
                forbids=("CartesianProduct",))
