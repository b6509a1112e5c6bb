"""Rotation-debt guard: every retired registry slot's oracle must exist.

SURVEY §2.7 retires a slot only with a shadow argument, and several of
those arguments claim "the retired slot's oracle lives verbatim in
tests/<file>::<test>". Until now that claim was enforced by discipline
only — deleting the named test would silently orphan the retired
surface. This guard (1) parses every ``tests/<file>.py::<test>``
reference out of SURVEY.md and asserts the referenced test function is
actually defined in the referenced file, and (2) pins the retired slots
whose rotations were justified BY such a named test, so removing the
claim sentence itself from SURVEY.md also fails.
"""

from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: retired slots whose SURVEY §2.7 rotation argument names a verbatim
#: oracle test (extend when a future rotation makes the same claim)
RETIRED_WITH_NAMED_ORACLE = (
    "simhash",
    "lineitem_cube",
    "exact_dedup",
    "lsh_topk",
)


def _survey() -> str:
    with open(os.path.join(REPO, "SURVEY.md")) as f:
        return f.read()


def test_every_survey_test_reference_exists():
    refs = set(re.findall(r"tests/(test_\w+)\.py::(test_\w+)", _survey()))
    assert refs, "SURVEY.md should reference at least one named test"
    for fname, tname in sorted(refs):
        path = os.path.join(REPO, "tests", f"{fname}.py")
        assert os.path.isfile(path), f"SURVEY references missing {fname}.py"
        with open(path) as f:
            src = f.read()
        assert re.search(rf"^def {tname}\(", src, re.M), (
            f"SURVEY.md claims {fname}.py::{tname} but the test is not "
            f"defined — a retired slot's oracle went missing")


def test_retired_slots_keep_their_named_oracle_claim():
    text = _survey()
    for slot in RETIRED_WITH_NAMED_ORACLE:
        # SOME mention of the slot must be followed within its paragraph
        # (~1200 chars) by a named tests/...::... oracle reference, or by
        # its dedicated parity test's name directly
        ok = any(
            re.search(rf"tests/test_\w+\.py::test_\w+"
                      rf"|test_{slot}_duckdb_parity",
                      text[m.end():m.end() + 1200])
            for m in re.finditer(rf"`{slot}`", text))
        assert ok, (
            f"SURVEY.md no longer ties retired slot {slot!r} to a named "
            f"oracle test")


def test_retired_slots_are_not_in_registry():
    import __spark_entry__ as entry
    qs = entry.queries()
    for slot in RETIRED_WITH_NAMED_ORACLE:
        assert slot not in qs, (
            f"{slot} is both 'retired' in SURVEY and live in the registry")
