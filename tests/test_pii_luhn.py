"""redact_pii's compliance-review kinds (r13 verdict #6): the
Luhn-gated credit_card redaction (pure column fold — candidates by
regex, checksum by digit aggregate, literal replace left-fold) and the
SSN-shaped national-id pattern, byte-parity replayed in DuckDB over
PII-dense constructed rows, plus curate() passthrough and the map-only
plan pin."""

import duckdb
import pytest

from pyspark.sql import functions as F

from anomalyzer_spark.functions import text
from anomalyzer_spark.plans import assert_plan

# card numbers: standard test PANs (Luhn-valid) + checksum-flipped twins
VALID_VISA = "4539148803436467"
VALID_VISA_SP = "4539 1488 0343 6467"
VALID_AMEX = "378282246310005"           # 15 digits
INVALID = "4539148803436468"             # last digit flipped


def _rows():
    return [
        (1, f"pay {VALID_VISA} today"),
        (2, f"pay {VALID_VISA_SP} today"),              # separator form
        (3, f"amex {VALID_AMEX} works"),
        (4, f"broken {INVALID} stays"),                 # fails Luhn
        (5, f"two cards {VALID_VISA} and {VALID_AMEX}"),
        (6, f"dup {VALID_VISA} twice {VALID_VISA}"),    # literal dup
        (7, "ssn 123-45-6789 inline"),
        (8, f"mixed 123-45-6789 then {VALID_VISA_SP}"),
        (9, "phone +1 415 555 0100 only"),
        (10, "clean document, nothing to strip."),
        (11, None),
        # 12 digits (below card window) and 20 digits (above): untouched
        # by credit_card even when Luhn-coincident
        (12, "short 123456789012 run"),
        (13, "long 12345678901234567890 run"),
        # review regressions (r14): the greedy candidate swallowing an
        # adjacent short token must not LEAK the contained valid card —
        # the prefix window validates and only the card redacts
        (14, f"card {VALID_VISA_SP} 22 euros"),
        # a longer Luhn-invalid run CONTAINING a valid card as a
        # substring must stay intact (word-bounded replace), and the
        # standalone valid occurrence still redacts
        (15, f"a {VALID_VISA} b 9{VALID_VISA} c"),
    ]


def _luhn_ok_sql(expr: str) -> str:
    """DuckDB predicate: the span expression's digits pass Luhn and the
    13-19 length window (the Spark _luhn_valid twin)."""
    d = f"regexp_replace({expr}, '[^0-9]', '', 'g')"
    a = f"ascii(substring(reverse({d}), (i+1)::INT, 1)) - 48"
    return (
        f"(length({d}) BETWEEN 13 AND 19 AND "
        f"list_sum(list_transform(range(0, length({d})), i -> "
        f"CASE WHEN i % 2 = 1 THEN "
        f"CASE WHEN 2 * ({a}) > 9 THEN 2 * ({a}) - 9 ELSE 2 * ({a}) END "
        f"ELSE {a} END)) % 10 = 0)")


def _card_subspan_sql() -> str:
    """DuckDB twin of _luhn_subspan: longest valid 13-19-digit prefix
    window of candidate `s`, else NULL."""
    def pk(k):
        return rf"regexp_extract(s, '^\d(?:[ -]?\d){{{k - 1}}}', 0)"
    whens = " ".join(
        f"WHEN {pk(k)} <> '' AND {_luhn_ok_sql(pk(k))} THEN {pk(k)}"
        for k in range(19, 12, -1))
    return f"CASE {whens} ELSE NULL END"


#: validated card sub-spans of `text` (the Spark _valid_subspans twin)
_LUHN_SQL_VALID = rf"""
list_filter(list_transform(
  regexp_extract_all(text, '\b\d(?:[ -]?\d){{12,18}}\b'),
  s -> {_card_subspan_sql()}), x -> x IS NOT NULL)
"""


def test_duckdb_byte_parity(spark):
    d = spark.createDataFrame(_rows(), "doc_id long, text string")
    got = sorted(map(tuple, text.redact_pii(
        d, kinds=("credit_card", "ssn", "phone"),
        with_counts=True).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW d AS SELECT * FROM (VALUES "
        + ",".join(
            "(%d, %s)" % (i, "NULL" if t is None
                          else "'" + t.replace("'", "''") + "'")
            for i, t in _rows()) + ") t(doc_id, text)")
    want = sorted(map(tuple, con.execute(rf"""
WITH v AS (
  SELECT doc_id, text, {_LUHN_SQL_VALID} AS valid FROM d),
cc AS (
  SELECT doc_id, text, len(valid) AS n_credit_card,
    CASE WHEN text IS NULL THEN NULL
         ELSE list_reduce(list_prepend(text, valid),
                          (acc, x) -> regexp_replace(
                            acc, '\b' || x || '\b', '[CREDIT_CARD]',
                            'g'))
    END AS r1
  FROM v),
s AS (
  SELECT cc.doc_id AS doc_id, n_credit_card,
    coalesce(len(regexp_extract_all(d.text,
             '\b\d{{3}}-\d{{2}}-\d{{4}}\b')), 0) AS n_ssn,
    coalesce(len(regexp_extract_all(d.text,
             '\+?\d[\d\- ().]{{7,}}\d\b')), 0) AS n_phone,
    regexp_replace(
      regexp_replace(r1, '\b\d{{3}}-\d{{2}}-\d{{4}}\b', '[SSN]', 'g'),
      '\+?\d[\d\- ().]{{7,}}\d\b', '[PHONE]', 'g') AS text
  FROM cc JOIN d USING (doc_id))
SELECT doc_id, text, coalesce(n_credit_card, 0), n_ssn, n_phone
FROM s""").fetchall()))
    assert got == want
    by_id = {r[0]: r for r in got}
    # valid cards redacted in all forms; checksum-flipped twin is NOT
    assert "[CREDIT_CARD]" in by_id[1][1]
    assert by_id[2][1] == "pay [CREDIT_CARD] today"
    assert "[CREDIT_CARD]" in by_id[3][1]
    assert "[CREDIT_CARD]" not in by_id[4][1]   # phone eats it instead
    assert by_id[5][1].count("[CREDIT_CARD]") == 2 and by_id[5][2] == 2
    assert by_id[6][1].count("[CREDIT_CARD]") == 2  # literal dup both
    assert by_id[7][1] == "ssn [SSN] inline" and by_id[7][3] == 1
    assert by_id[8][1] == "mixed [SSN] then [CREDIT_CARD]"
    assert by_id[10][1] == "clean document, nothing to strip."
    assert by_id[11][1] is None and by_id[11][2] == 0
    assert "[CREDIT_CARD]" not in by_id[12][1]
    assert "[CREDIT_CARD]" not in by_id[13][1]
    assert by_id[14][1] == "card [CREDIT_CARD] 22 euros"
    # the longer Luhn-invalid run stays INTACT through the card pass
    # (word-bounded replace — no '9[CREDIT_CARD]' corruption) and is
    # then judged whole by the later phone pattern, as documented
    assert by_id[15][1] == "a [CREDIT_CARD] b [PHONE] c"


VALID_IBAN = "DE89370400440532013000"          # ISO 13616 example
VALID_IBAN_SP = "GB29 NWBK 6016 1331 9268 19"  # print form, valid
INVALID_IBAN = "DE89370400440532013001"        # last digit flipped


def test_iban_mod97_duckdb_parity(spark):
    rows = [
        (1, f"acct {VALID_IBAN} eur"),
        (2, f"acct {VALID_IBAN_SP} gbp"),
        (3, f"bad {INVALID_IBAN} stays"),
        (4, f"two {VALID_IBAN} and {VALID_IBAN_SP}"),
        (5, "no iban here, just words"),
        (6, None),
        (7, "short DE8937040044 run"),          # < 15 compact chars
        # review regression (r14): the grouped-form candidate swallows
        # a following 1-4-char word when the compact length is ≡0 mod 4
        # (AT = 20 chars) — the trailing-group trim must recover the
        # valid IBAN
        (8, "pay AT61 1904 3002 3457 3201 cash now"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, text.redact_pii(
        d, kinds=("iban",), with_counts=True).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW d AS SELECT * FROM (VALUES "
        + ",".join(
            "(%d, %s)" % (i, "NULL" if t is None
                          else "'" + t.replace("'", "''") + "'")
            for i, t in rows) + ") t(doc_id, text)")
    def iban_ok(expr):
        t = f"regexp_replace(upper({expr}), '[^A-Z0-9]', '', 'g')"
        r = f"(substring({t}, 5, 34) || substring({t}, 1, 4))"
        return (
            f"(length({t}) BETWEEN 15 AND 34 AND "
            f"list_reduce(list_prepend('0', list_transform("
            f"range(0, length({t})), i -> substring({r}, (i+1)::INT, 1))),"
            f"(acc, c) -> CASE WHEN c BETWEEN '0' AND '9' "
            f"THEN ((acc::INT * 10 + (ascii(c) - 48)) % 97)::VARCHAR "
            f"ELSE ((acc::INT * 100 + (ascii(c) - 55)) % 97)::VARCHAR END)"
            f" = '1')")

    trim1 = r"regexp_replace(s, ' [A-Za-z0-9]{1,4}$', '')"
    trim2 = (r"regexp_replace(regexp_replace(s, ' [A-Za-z0-9]{1,4}$', '')"
             r", ' [A-Za-z0-9]{1,4}$', '')")
    sub = (f"CASE WHEN {iban_ok('s')} THEN s "
           f"WHEN {iban_ok(trim1)} THEN {trim1} "
           f"WHEN {iban_ok(trim2)} THEN {trim2} ELSE NULL END")
    want = sorted(map(tuple, con.execute(rf"""
WITH v AS (
  SELECT doc_id, text,
    list_filter(list_transform(
      regexp_extract_all(text,
        '\b[A-Z]{{2}}\d{{2}}(?:[A-Za-z0-9]{{11,30}}'
        || '|(?: [A-Za-z0-9]{{4}}){{2,7}}(?: [A-Za-z0-9]{{1,4}})?)\b'),
      s -> {sub}), x -> x IS NOT NULL) AS valid
  FROM d)
SELECT doc_id,
  CASE WHEN text IS NULL THEN NULL
       ELSE list_reduce(list_prepend(text, valid),
                        (acc, x) -> regexp_replace(
                          acc, '\b' || x || '\b', '[IBAN]', 'g')) END
    AS text,
  coalesce(len(valid), 0) AS n_iban
FROM v""").fetchall()))
    assert got == want
    by_id = {r[0]: r for r in got}
    assert by_id[1][1] == "acct [IBAN] eur"
    assert by_id[2][1] == "acct [IBAN] gbp"      # spaced print form
    assert "[IBAN]" not in by_id[3][1]           # checksum-flipped twin
    assert by_id[4][2] == 2
    assert by_id[5][2] == 0 and by_id[6][1] is None
    assert "[IBAN]" not in by_id[7][1]           # below length window
    assert by_id[8][1] == "pay [IBAN] cash now"  # trim recovers it


@pytest.mark.slow
def test_redaction_idempotent_hypothesis(spark):
    """Fixed-point property of the checksum-gated kinds: redacting an
    already-redacted document changes nothing. This holds by
    construction — replacement tokens carry no digits and the bracket
    breaks \\b adjacency, so no new candidate can form; and any
    validated sub-span of a surviving run would have been redacted in
    the first pass (same walk) — and it is exactly the property the
    r14 review's partial-corruption bug ('9[CREDIT_CARD]') violated."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(
        st.text(alphabet="0123456789 -abIBANDE", min_size=0, max_size=40),
        min_size=1, max_size=6))
    @settings(max_examples=8, deadline=None)
    def run(chunks):
        s = (" " + VALID_VISA_SP + " ").join(chunks)
        df = spark.createDataFrame([(1, s)], "doc_id long, text string")
        kinds = ("iban", "credit_card", "ssn")
        once = text.redact_pii(df, kinds=kinds).collect()[0]["text"]
        df2 = spark.createDataFrame([(1, once)],
                                    "doc_id long, text string")
        twice = text.redact_pii(df2, kinds=kinds).collect()[0]["text"]
        assert twice == once, (s, once, twice)

    run()


def test_defaults_unchanged_and_validation(spark):
    # the new kinds are OPT-IN: default output is byte-identical to a
    # pre-r14 call (credit_card/ssn absent from the default chain)
    d = spark.createDataFrame(
        [(1, f"x {VALID_VISA} and a@b.co")], "doc_id long, text string")
    out = text.redact_pii(d).collect()[0]["text"]
    assert "[CREDIT_CARD]" not in out and "[EMAIL]" in out
    with pytest.raises(ValueError, match="unknown PII kind"):
        text.redact_pii(d, kinds=("credit_card", "nope"))


def test_curate_passthrough(spark):
    from anomalyzer_spark.pipeline import CurationConfig, curate
    d = spark.createDataFrame(
        [(i, f"doc {i} card {VALID_VISA} ssn 123-45-6789 text. "
             "More filler words here to keep it.") for i in range(8)],
        "doc_id long, text string")
    res = curate(d, CurationConfig(
        redact=True,
        redact_kinds=("email", "url", "ipv4", "credit_card", "ssn",
                      "phone")))
    red = {r["doc_id"]: r["text"]
           for r in res.stages["redacted"].collect()}
    assert all("[CREDIT_CARD]" in t and "[SSN]" in t
               for t in red.values())


def test_map_only_plan(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = text.redact_pii(
        d, kinds=("email", "url", "ipv4", "credit_card", "ssn", "phone"),
        with_counts=True)
    assert_plan(out, max_exchanges=0, forbids=("CartesianProduct",))
