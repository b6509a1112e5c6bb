"""code.with_license_info (r13 verdict #7): SPDX tag extraction,
header-phrase family detection, the permissive allowlist (fail-closed),
and opt-out markers — DuckDB parity over planted headers + the map-only
plan pin."""

import duckdb

from pyspark.sql import functions as F

from anomalyzer_spark.functions import code
from anomalyzer_spark.plans import assert_plan


def _rows():
    return [
        (1, "// SPDX-License-Identifier: MIT\nint main() {}"),
        (2, "# SPDX-License-Identifier: GPL-3.0-only\nprint(1)"),
        (3, "// SPDX-License-Identifier: MIT OR Apache-2.0\nx"),  # compound
        (4, "/* Licensed under the Apache License, Version 2.0 */\ny"),
        (5, "# This program is free software under the GNU General "
            "Public License\nz"),
        (6, "Permission is hereby granted, free of charge, to any "
            "person obtaining a copy\nof this software"),
        (7, "Redistribution and use in source and binary forms, with "
            "or without\nmodification, are permitted"),
        (8, "This is free and unencumbered software released into "
            "the public domain."),
        (9, "plain file, no license text at all"),
        (10, "content here\n<meta name='robots' content='noai'>"),
        (11, "footer: please do not use this text for model training."),
        # SPDX tag beats a conflicting header phrase
        (12, "// SPDX-License-Identifier: GPL-2.0-only\n"
             "/* MIT License */\ncode"),
        # phrase BEYOND the 2048-char header slice is not scanned
        (13, ("x" * 3000) + "\nMIT License\n"),
        (14, None),
        # r14 review regression: an SPDX tag QUOTED beyond the header
        # slice must NOT flip the fail-closed gate open
        (15, ("y" * 3000) + "\n// SPDX-License-Identifier: MIT\n"),
    ]


def test_duckdb_parity_and_planted_headers(spark):
    d = spark.createDataFrame(_rows(), "doc_id long, text string")
    got = sorted(map(tuple, code.with_license_info(d)
                     .select("doc_id", *code.LICENSE_COLS).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW d AS SELECT * FROM (VALUES "
        + ",".join(
            "(%d, %s)" % (i, "NULL" if t is None else
                          "'" + t.replace("'", "''")
                          .replace("\n", "' || chr(10) || '") + "'")
            for i, t in _rows()) + ") t(doc_id, text)")
    perm = ", ".join(f"'{p}'" for p in code.PERMISSIVE_LICENSES)
    want = sorted(map(tuple, con.execute(rf"""
WITH s AS (
  SELECT doc_id, text, substring(text, 1, 2048) AS head,
    nullif(trim(regexp_extract(substring(text, 1, 2048),
      'SPDX-License-Identifier:[ \t]*([A-Za-z0-9 .+()-]+)', 1)), '')
      AS spdx_id
  FROM d),
p AS (
  SELECT *, CASE
    WHEN regexp_matches(head, '(?i)Apache License,? Version 2\.0'
         || '|apache\.org/licenses/LICENSE-2\.0') THEN 'Apache-2.0'
    WHEN regexp_matches(head,
         '(?i)GNU (General|Lesser|Affero) Public License') THEN 'GPL'
    WHEN regexp_matches(head, '(?i)Mozilla Public License')
         THEN 'MPL-2.0'
    WHEN regexp_matches(head, '(?i)\bMIT License\b'
         || '|Permission is hereby granted, free of charge') THEN 'MIT'
    WHEN regexp_matches(head,
         '(?i)Redistribution and use in source and binary forms')
         THEN 'BSD'
    WHEN regexp_matches(head, '(?i)\bISC License\b') THEN 'ISC'
    WHEN regexp_matches(head,
         '(?i)This is free and unencumbered software')
         THEN 'Unlicense'
    END AS phrase
  FROM s)
SELECT doc_id, spdx_id,
  coalesce(spdx_id, phrase) AS license_detected,
  coalesce(CASE WHEN spdx_id IS NOT NULL THEN spdx_id IN ({perm})
                ELSE phrase IN ('Apache-2.0','MIT','BSD','ISC',
                                'Unlicense') END,
           false) AS license_permissive,
  coalesce(regexp_matches(text, '(?i)\b(noai|noimageai|noml)\b'
    || '|do not (use|include)[^\n]{{0,60}}(training|dataset)'
    || '|opt[ -]?out[^\n]{{0,30}}(ai|ml) training'), false)
    AS license_opt_out
FROM p""").fetchall()))
    assert got == want
    by_id = {r[0]: r for r in got}
    # (doc_id, spdx_id, detected, permissive, opt_out)
    assert by_id[1] == (1, "MIT", "MIT", True, False)
    assert by_id[2][1] == "GPL-3.0-only" and by_id[2][3] is False
    assert by_id[3][1] == "MIT OR Apache-2.0" and by_id[3][3] is False
    assert by_id[4][2] == "Apache-2.0" and by_id[4][3] is True
    assert by_id[5][2] == "GPL" and by_id[5][3] is False
    assert by_id[6][2] == "MIT" and by_id[6][3] is True
    assert by_id[7][2] == "BSD" and by_id[7][3] is True
    assert by_id[8][2] == "Unlicense" and by_id[8][3] is True
    assert by_id[9] == (9, None, None, False, False)   # fail closed
    assert by_id[10][4] is True and by_id[11][4] is True
    assert by_id[12][2] == "GPL-2.0-only"   # SPDX beats header phrase
    assert by_id[13][2] is None             # beyond the header slice
    assert by_id[14] == (14, None, None, False, False)
    assert by_id[15] == (15, None, None, False, False)  # quoted-tag body


def test_curate_license_gate(spark):
    from anomalyzer_spark.pipeline import CurationConfig, curate
    rows = [
        (1, "// SPDX-License-Identifier: MIT\ngood code here."),
        (2, "// SPDX-License-Identifier: GPL-3.0-only\ncopyleft."),
        (3, "no license at all"),                      # fail closed
        (4, "// SPDX-License-Identifier: MIT\nnoai marker here"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    res = curate(d, CurationConfig(license_gate=True, dedup=None))
    kept = {r["doc_id"] for r in res.stages["license_gated"].collect()}
    assert kept == {1}


def test_map_only_plan_and_passthrough(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = code.with_license_info(d)
    assert set(d.columns) <= set(out.columns)
    assert_plan(out, max_exchanges=0, forbids=("CartesianProduct",))
    # composes with the code-stats gate on one scan
    both = code.with_license_info(code.with_code_stats(d))
    assert_plan(both, max_exchanges=0)
