"""bench.py floor maintenance: on a plan-hash rotation the re-baseliner
must RESTORE the archived honest idle measurement of the new hash when
one exists, never invent a floor from the current (possibly steal-laden)
run — the round-12 bm25 ratchet (2.613 s adopted from a 2.88 s-steal
driver run while 2.279 s for the same hash sat in archived[]). Also
pins the floors.json invariant: no current floor worse than its own
archive for the same plan hash."""

import json
import os

from bench import FLOORS_PATH, update_floor


def test_restore_archived_floor_on_plan_rotation():
    # a rider rotated the plan A -> B; B's honest floor is archived
    cur = {"floor_sec": 1.259, "plan_hash": "aaaa", "source": "bench",
           "archived": [{"floor_sec": 2.279, "plan_hash": "bbbb",
                         "source": "re-baseline"}]}
    entry, action = update_floor(cur, best=2.88, fp="bbbb")
    assert action == "restore"
    assert entry["floor_sec"] == 2.279  # NOT the steal-laden 2.88
    assert entry["plan_hash"] == "bbbb"
    assert entry["source"] == "restore"
    # the dead floor is archived for audit
    assert {"floor_sec": 1.259, "plan_hash": "aaaa",
            "source": "bench"} in entry["archived"]


def test_restore_still_folds_in_a_faster_run():
    cur = {"floor_sec": 1.0, "plan_hash": "aaaa", "source": "bench",
           "archived": [{"floor_sec": 2.279, "plan_hash": "bbbb",
                         "source": "bench"}]}
    entry, action = update_floor(cur, best=2.1, fp="bbbb")
    assert action == "restore" and entry["floor_sec"] == 2.1


def test_rebaseline_only_for_genuinely_new_hash():
    cur = {"floor_sec": 1.0, "plan_hash": "aaaa", "source": "bench",
           "archived": [{"floor_sec": 2.279, "plan_hash": "bbbb",
                         "source": "bench"}]}
    entry, action = update_floor(cur, best=3.5, fp="cccc")
    assert action == "re-baseline" and entry["floor_sec"] == 3.5
    assert entry["plan_hash"] == "cccc"


def test_same_plan_paths():
    cur = {"floor_sec": 1.0, "plan_hash": "aaaa", "source": "bench"}
    entry, action = update_floor(cur, best=0.9, fp="aaaa")
    assert action == "new-floor" and entry["floor_sec"] == 0.9
    entry, action = update_floor(cur, best=1.5, fp="aaaa")
    assert action == "keep" and entry["floor_sec"] == 1.0
    entry, action = update_floor({}, best=1.5, fp="aaaa")
    assert action == "new-floor" and entry["floor_sec"] == 1.5


def test_floors_json_never_worse_than_own_archive():
    """The committed floors must honor the restore contract: for every
    entry, no archived measurement of the SAME plan hash beats the
    current floor (that would mean a floor was invented over an
    archived honest one)."""
    if not os.path.isfile(FLOORS_PATH):
        return
    with open(FLOORS_PATH) as f:
        floors = json.load(f)
    for name, cur in floors.items():
        known = [a["floor_sec"] for a in cur.get("archived", [])
                 if a.get("plan_hash") == cur.get("plan_hash")
                 and a.get("floor_sec") is not None]
        if known:
            assert cur["floor_sec"] <= min(known), (
                f"{name}: floor {cur['floor_sec']} worse than archived "
                f"{min(known)} for the same plan hash")


def test_floors_active_gates_scale_and_cores():
    """Reduced-core scaling legs (the driver benches at a lower
    $SPARK_GRAFT_CPUS too) must neither compare against nor fold the
    full-core sf0.1 floors: an 8-core run rotated bm25's floor hash and
    lowered four floors before the gate existed."""
    from bench import floors_active
    # canonical: sf0.1 at full cores (env unset / local[*] / == machine)
    assert floors_active("0.1", None, 32)
    assert floors_active("0.1", "*", 32)
    assert floors_active("0.1", "32", 32)
    # reduced-core scaling leg: same sf, fewer cores -> inactive
    assert not floors_active("0.1", "8", 32)
    assert not floors_active("0.1", "1", 32)
    # other scales never touch floors regardless of cores
    assert not floors_active("0.01", None, 32)
    assert not floors_active("0.001", "32", 32)
    # oversubscribed/equal explicit counts still count as full-core
    assert floors_active("0.1", "64", 32)
    # unparseable core spec fails CLOSED (r15 advice): only the known
    # '*' spelling counts as full-core — a malformed spec must not
    # compare/fold floors (the contamination class this gate prevents)
    assert not floors_active("0.1", "not-a-number", 32)
