"""Benchmark harness (driver contract: prints ONE JSON line).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Each query is forced
end-to-end with the noop sink (full materialization, no driver transfer) and
timed individually.

Falsifiability (round-6): per-query swings of 2-5x across rounds could not
previously be attributed to plan changes vs host variance. A ``detail`` map
is written to ``BENCH_DETAIL.json`` beside this script (round-7: it used to
ride the headline JSON line, which outgrew the driver's stdout-tail capture
and broke the parse) with, per query:

- ``plan_hash``  — md5 (12 hex) of the physical plan string with expression
  ids / plan ids / object addresses normalized. Identical hash across rounds
  means Catalyst produced the same plan, so a time delta is NOT a plan or
  code regression. (With AQE on, this fingerprints the initial physical
  plan — deterministic for the same code + data, which is what attribution
  needs; runtime re-plans don't change it.)
- ``times``      — ALL timed repeat wall times (seconds), not just the best.
- ``warm_s``     — the untimed warm pass (codegen/JIT compile cost lives
  here, not in ``times``).
- ``cpu_s``      — process-tree CPU seconds (python driver + JVM + Arrow
  workers, from /proc) consumed across the timed repeats. wall >> cpu/cores
  → scheduling/external load; cpu growing with wall → the work itself grew.
  Accumulated per-pid (sampled after every repeat), so exiting worker
  pools never drive the delta negative.
- ``gc_ms``      — JVM garbage-collection milliseconds across the timed
  repeats (GC MXBeans), the usual "work itself grew" culprit.
- ``steal_s``    — hypervisor CPU-steal seconds (all vCPUs, /proc/stat)
  during the timed repeats. This box is a VM: a slow repeat with matching
  steal is the HOST taking cycles, attributable without hand-waving.

The headline ``queries``/``value`` fields keep their original driver-facing
shape (best-of-N per query, summed) for cross-round comparability.

Usage: python bench.py [--sf-dir DIR] [--repeat N] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from anomalyzer_spark.session import get_spark  # noqa: E402

#: headline set — detection (few/many keys, MC + deterministic), dedup,
#: similarity, text, joins/aggregation/window coverage
HEADLINE = (
    "detect_full",
    "detect_default",
    "detect_full_users",
    "detect_wide",
    "detect_rolling",
    "detect_horizon",
    "text_profile",
    "minhash_lsh",
    "ngram_jaccard",
    # simhash left the registry in the round-10 rotation (signature now
    # rides text_profile's projection, so its cost is tracked there);
    # semantic_pairs takes its headline seat
    "semantic_pairs",
    "cosine_topk",
    "pricing_summary",
    "top_customers",
    "running_totals",
    "asof_join",
    # round-7 registry additions — tracked from their first round so the
    # curation/range stacks get the same regression visibility as detect
    # (detect_det_users left the registry in the round-7 third rotation;
    # its bench niche — deterministic methods × many keys — is inside
    # detect_full_users' superset run)
    "range_join",
    "curation_pipeline",
    "decontam",
    "dedup_paragraphs",
    "text_pipeline",
    # round-9 registry additions (rotations: batch sessions -> snapshot_diff,
    # detect_resampled -> drift_psi, lsh_topk -> quality_checks), tracked
    # from their first round; detect_resampled's bench niche (resample
    # bucket arithmetic) times on inside resample_stream's parity tests
    "snapshot_diff",
    "quality_checks",
    "drift_psi",
    # round-9 second-session rotation (exact_dedup -> bm25): tracked from
    # its first round; exact_dedup's bench niche (content-hash groupBy)
    # times on inside data_pipeline's keep-first stage and dedup_stream
    "bm25",
    # round-9 fifth-session rotation (lineitem_cube -> dup_spans): tracked
    # from its first round; lineitem_cube's bench niche (grouping-sets
    # Expand) times on inside orders_rollup's parity test
    "dup_spans",
    # round-15 streaming drill (r14 verdict #6): the 7 streaming slots
    # were correctness-checked but never floor-tracked, so a streaming-
    # path perf regression (the r12c file-storm class) was invisible
    # round-over-round. dedup_stream drains a fixed 3-micro-batch split
    # eagerly at query-construction time, so each timed lap is a full
    # drain (input write -> 3 triggers -> final-state read); the
    # returned frame's plan (memory-sink read + final-state window) is
    # what the plan hash fingerprints.
    "dedup_stream",
)


def plan_fingerprint(df, _mask_sfdir: bool = True) -> str:
    """12-hex md5 of the physical plan with volatile ids normalized.

    Stable across sessions for the same code + data; changes iff Catalyst
    picks a different plan. Exprs (``#123``), plan ids, codegen stage ids,
    and JVM object addresses are masked; file listings/paths are kept (same
    testdata → same strings).
    """
    # lift the render-time truncation caps while stringifying: FileScan
    # metadata (DataFilters etc.) is cut at spark.sql.maxMetadataStringLength
    # CHARS, so where the "..." lands depends on expr-id DIGIT WIDTH — i.e.
    # on session history — and the same plan hashed differently in
    # different sessions (observed: range_join/decontam "re-baselining"
    # with zero code change). Render untruncated, then normalize.
    sess = df.sparkSession
    caps = {"spark.sql.maxMetadataStringLength": "100000",
            "spark.sql.debug.maxToStringFields": "10000"}
    old = {k: sess.conf.get(k, None) for k in caps}
    for k, v in caps.items():
        sess.conf.set(k, v)
    try:
        s = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            if v is None:
                sess.conf.unset(k)
            else:
                sess.conf.set(k, v)
    s = re.sub(r"#\d+", "#x", s)
    # the scale-factor base directory is masked so the SAME code+data
    # hashes identically whether it reads the driver's testdata or the
    # bench-local multi-row-group re-materialization (.bench_fixtures —
    # identical rows, different parquet layout): a fixture relocation is
    # not a plan change. floors.json was migrated in place (round 13);
    # _mask_sfdir=False reproduces the pre-r13 hash for that migration.
    if _mask_sfdir:
        s = re.sub(r"file:[^\s\]\[,]*/sf[0-9.]+/", "file:<SFDIR>/", s)
    # per-process query-tmp roots (streaming drills: input/store/ckpt
    # live under anomalyzer_q_<name>_<uid>_<pid>) — the pid is session
    # identity, not plan shape; without this mask every bench process
    # would "re-baseline" the streaming drill's floor
    s = re.sub(r"anomalyzer_q_(\w+)_\d+_\d+", r"anomalyzer_q_\1_U_P", s)
    # HOF lambda variables carry a session-global counter (x_10, y_11, …)
    s = re.sub(r"lambda ([a-zA-Z]+)_\d+", r"lambda \1_n", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"\[id=#?x?\d*\]", "[id=x]", s)
    s = re.sub(r"@[0-9a-fA-F]{6,}", "@x", s)
    s = re.sub(r"\(\d+\)", "(x)", s)  # codegen stage ids "*(3) Project"
    # RewriteDistinctAggregates assigns its `gid` group ids in an order
    # that depends on expression-id allocation history: an aggregate with
    # TWO count-distincts (decontam) renders `FILTER (WHERE (gid#x = 1))`
    # vs `= 2` swapped — and the Expand projection rows permuted — across
    # otherwise identical compilations (observed flip-flopping floors
    # through round 12). Canonicalize: mask the gid literals, then sort
    # Expand's projection-row list after masking integer literals inside
    # the rows (the gid column rides there too).
    s = re.sub(r"gid#x = \d+", "gid#x = n", s)

    def _canon_expand(m):
        def canon_row(r):
            items = [re.sub(r"^\d+$", "n", it)
                     for it in r.strip("[]").split(", ")]
            return "[" + ", ".join(sorted(items)) + "]"

        rows = sorted(canon_row(r)
                      for r in re.findall(r"\[[^\]]*\]", m.group(1)))
        attrs = sorted(m.group(2).split(", "))
        return ("Expand [" + ", ".join(rows) + "], ["
                + ", ".join(attrs) + "]")

    # rows are sorted AFTER sorting within each row (the rewrite permutes
    # the Expand's column layout itself, not just the row order), and the
    # trailing output-attribute list is sorted with them
    s = re.sub(r"Expand \[(\[[^\]]*\](?:, \[[^\]]*\])*)\], \[([^\[\]]*)\]",
               _canon_expand, s)
    # ... and the rewrite's grouping keys permute with the gids, dragging
    # HashAggregate keys=/output= lists and Exchange hashpartitioning
    # argument order along. Key ORDER never changes what a plan computes
    # (same grouping, same co-partitioning), so sort those flat lists.
    def _sort_items(m):
        return m.group(1) + ", ".join(sorted(m.group(2).split(", "))) \
            + m.group(3)

    s = re.sub(r"(keys=\[)([^\[\]]*)(\])", _sort_items, s)
    s = re.sub(r"(output=\[)([^\[\]]*)(\])", _sort_items, s)
    s = re.sub(r"(hashpartitioning\()([^()]*)(\))", _sort_items, s)
    return hashlib.md5(s.encode()).hexdigest()[:12]


class _TreeCPU:
    """Accumulates CPU seconds (utime+stime) of this process and every
    descendant — the JVM child and its Arrow python workers — via per-pid
    INCREMENTS between samples, so a worker that exits keeps the CPU it
    had at its last sample instead of subtracting it from the total (the
    end-minus-start probe this replaces went NEGATIVE when large worker
    pools died mid-interval). Call ``sample()`` at least once per repeat;
    at most one sample-interval of an exiting worker's tail is lost."""

    def __init__(self) -> None:
        self._clk = os.sysconf("SC_CLK_TCK")
        self._last: dict[int, float] = {}
        self.total = 0.0
        self.sample()

    def sample(self) -> float:
        cpu: dict[int, float] = {}
        ppid_of: dict[int, int] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    st = f.read()
            except OSError:
                continue
            rest = st[st.rindex(")") + 2:].split()
            pid = int(d)
            ppid_of[pid] = int(rest[1])
            cpu[pid] = (int(rest[11]) + int(rest[12])) / self._clk
        children: dict[int, list[int]] = {}
        for pid, pp in ppid_of.items():
            children.setdefault(pp, []).append(pid)
        stack = [os.getpid()]
        while stack:
            p = stack.pop()
            if p in cpu:
                self.total += max(0.0, cpu[p] - self._last.get(p, 0.0))
                self._last[p] = cpu[p]
            stack.extend(children.get(p, ()))
        return self.total


def _steal_s() -> float:
    """Cumulative hypervisor steal seconds across all vCPUs (/proc/stat
    col 9) — the falsifier for 'host variance': a wall-time swing with a
    matching per-query steal delta is the host taking CPU away from the
    guest, not a plan or code regression."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8]) / os.sysconf("SC_CLK_TCK")


def _jvm_gc_ms(spark) -> int:
    """Cumulative JVM GC milliseconds across all collectors (MXBeans)."""
    beans = (spark._jvm.java.lang.management.ManagementFactory
             .getGarbageCollectorMXBeans())
    return sum(max(beans.get(i).getCollectionTime(), 0)
               for i in range(beans.size()))


#: one machine-readable source for per-query best-known floors (the
#: 2x-rule contract surface): {query: {floor_sec, plan_hash, source}}.
#: Seeded round 10 from the min across all historical BENCH_r*.json
#: sf0.1 runs; updated below whenever an sf0.1 run beats a floor.
FLOORS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "tools", "floors.json")

#: slots whose headline time deliberately carries an attestation rider
#: (extra lanes that exist for driver value-hash coverage, not engine
#: speed), mapped to the last PLAIN-LANE floor measured before the
#: rider landed (tools/floors.json archive). The headline JSON's
#: ``ex_rider_total`` substitutes these values so round-over-round
#: totals separate engine speed from attestation price without reading
#: BASELINE prose (r13 verdict #8). Update when a rider lands or
#: retires; values are recorded measurements, same contract as floors.
RIDER_PLAIN_FLOORS = {
    "decontam": 0.732,           # pre-Bloom/multi-suite lane (r13)
    "text_profile": 0.990,       # pre-gopher/c4 riders (r14)
    "curation_pipeline": 1.549,  # pre-nq/split riders (r14)
}


def _load_floors() -> dict:
    try:
        with open(FLOORS_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def floors_active(sf: str, cpus_env: str | None, machine_cpus: int) -> bool:
    """Floors are defined at the driver scale (sf0.1) AND the full-core
    session only.

    The driver also runs this bench at a REDUCED core count
    ($SPARK_GRAFT_CPUS) to measure per-query scaling; folding those runs
    into floors.json would ratchet in bests measured under a different
    parallelism — and, for queries whose plans embed core-derived
    partition counts, re-baseline the floor onto a plan hash the
    full-core run can never reproduce (observed: an 8-core sf0.1 run
    rotated bm25's floor hash and lowered four floors). Such runs still
    time, print detail, and emit the headline JSON — they just neither
    compare against nor update the floor record."""
    if sf != "0.1":
        return False
    if not cpus_env or cpus_env == "*":
        return True
    try:
        return int(cpus_env) >= machine_cpus
    except ValueError:
        # fail CLOSED (r15 advice): an unparseable core spec must not
        # fold floors — that's exactly the contamination class this gate
        # exists to prevent. The known full-core spelling '*' is handled
        # above; anything else unrecognized just skips floor bookkeeping.
        return False


def update_floor(cur: dict, best: float, fp: str) -> tuple[dict, str]:
    """Fold one run's best time into a floor entry; returns
    ``(new_entry, action)`` with action one of ``restore`` /
    ``re-baseline`` / ``new-floor`` / ``keep``.

    The plan-rotation contract (round-12 verdict): when the plan hash
    changes, FIRST look for the new hash in ``archived[]`` and restore
    that honest idle measurement — only invent a floor from the current
    observation when the hash is genuinely new. The driver's runs carry
    hypervisor steal; adopting one as a floor on every rider rotation
    silently ratchets floors upward (bm25: 2.613 s adopted from a
    2.88 s-steal run while 2.279 s for the SAME hash sat in the
    archive). A floor is "best time ever measured for this plan", so a
    restored floor still folds in ``best`` via min."""
    if cur.get("floor_sec") is not None and \
            cur.get("plan_hash") not in (None, fp):
        archived = list(cur.get("archived", []))
        known = [a["floor_sec"] for a in archived
                 if a.get("plan_hash") == fp
                 and a.get("floor_sec") is not None]
        dead = {k: cur[k] for k in ("floor_sec", "plan_hash", "source")
                if k in cur}
        if known:
            floor = min(min(known), best)
            entry = {"floor_sec": floor, "plan_hash": fp,
                     "source": "restore", "archived": (archived + [dead])[-5:]}
            return entry, "restore"
        entry = {"floor_sec": best, "plan_hash": fp,
                 "source": "re-baseline", "archived": (archived + [dead])[-5:]}
        return entry, "re-baseline"
    if cur.get("floor_sec") is None or best < cur["floor_sec"]:
        return {**cur, "floor_sec": best, "plan_hash": fp,
                "source": "bench"}, "new-floor"
    return cur, "keep"


def _bench_fixtures(sf_dir: str) -> str:
    """Return a bench-local fixture dir with the driver's tables
    re-materialized into ≥32 parquet row groups (identical rows; small
    tables are symlinked). The driver writes every table as ONE row
    group, so a scan-heavy query serializes its leaf stage on one task
    regardless of cluster width — pricing_summary ran at a measured
    1.8× its floor and bm25's vector leg single-threaded purely from
    fixture layout (BASELINE round-12 postscript). A 100 TB corpus is
    never one row group; benching on one measures the artifact, not the
    engine. Rebuilt automatically when the source fixtures change
    (driver regenerates them per round); disable with
    SPARK_GRAFT_NO_REMAT=1. Plan hashes are unaffected — the sf base
    dir is masked in ``plan_fingerprint``."""
    import glob

    if os.environ.get("SPARK_GRAFT_NO_REMAT"):
        return sf_dir
    try:
        import pyarrow.parquet as pq

        sf_dir = sf_dir.rstrip("/")
        dst = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           ".bench_fixtures", os.path.basename(sf_dir))
        marker_path = os.path.join(dst, "_remat.json")
        srcs = sorted(glob.glob(f"{sf_dir}/*.parquet"))
        want = {os.path.basename(p): [os.path.getmtime(p),
                                      os.path.getsize(p)] for p in srcs}
        marker = {"src": sf_dir, "files": want, "rg_target": 32}
        if os.path.isfile(marker_path):
            with open(marker_path) as f:
                if json.load(f) == marker:
                    return dst
        import shutil

        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(dst)
        for p in srcs:
            name = os.path.basename(p)
            f = pq.ParquetFile(p)
            rows = f.metadata.num_rows
            if rows < 2000:
                os.symlink(p, os.path.join(dst, name))
                continue
            # one file, ~32 row groups: splittable by byte range into
            # parallel tasks without changing paths/row order/values
            pq.write_table(f.read(), os.path.join(dst, name),
                           row_group_size=max(1, -(-rows // 32)))
        with open(marker_path, "w") as f:
            json.dump(marker, f)
        print(f"# re-materialized bench fixtures -> {dst}",
              file=sys.stderr)
        return dst
    except Exception as e:  # never let fixture prep break the bench
        print(f"# fixture re-materialization failed ({e}); "
              f"using {sf_dir}", file=sys.stderr)
        return sf_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    # best-of-N headline with ALL repeats recorded in detail.times; the
    # first (untimed) warm pass pays one-time whole-stage-codegen/Janino
    # compilation (seconds for the wide higher-order expressions) —
    # steady-state throughput is the metric.
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = tuple(args.queries) or HEADLINE
    spark = get_spark("anomalyzer-bench")
    qs = entry_mod.queries()
    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    # queries run against the multi-row-group re-materialization of the
    # same rows (sf label + floor gating keep keying off the source dir)
    run_dir = _bench_fixtures(args.sf_dir)

    # warm the JVM + parquet footers with a trivial scan
    spark.read.parquet(f"{run_dir}/region.parquet").count()

    # floors are defined at the driver scale (sf0.1) on the full-core
    # session only — other scales and reduced-core scaling legs neither
    # compare against nor update them (see floors_active)
    floors_on = floors_active(sf, os.environ.get("SPARK_GRAFT_CPUS"),
                              os.cpu_count() or 1)
    floors = _load_floors() if floors_on else {}

    timings: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name in names:
        df = qs[name](spark, run_dir)
        fp = plan_fingerprint(df)
        # one untimed warm pass first: whole-stage-codegen compilation, C2
        # JIT of the huge generated methods, and Python-worker startup are
        # one-time session costs, not per-query throughput — without this
        # the first timed run is bimodally 2-7x slower depending on JIT
        # queue timing (BASELINE.md round-4 notes), and best-of-N at small
        # N still samples it.
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        warm_s = time.perf_counter() - t0
        times: list[float] = []
        tree = _TreeCPU()
        cpu0, gc0, st0 = tree.total, _jvm_gc_ms(spark), _steal_s()
        for _ in range(args.repeat):
            t0 = time.perf_counter()
            qs[name](spark, run_dir).write.mode("overwrite").format(
                "noop").save()
            times.append(round(time.perf_counter() - t0, 3))
            tree.sample()
        cpu_s, gc_ms = tree.total - cpu0, _jvm_gc_ms(spark) - gc0
        steal_s = _steal_s() - st0
        timings[name] = min(times)
        detail[name] = {
            "plan_hash": fp,
            "times": times,
            "warm_s": round(warm_s, 3),
            "cpu_s": round(cpu_s, 3),
            "gc_ms": int(gc_ms),
            "steal_s": round(steal_s, 3),
        }
        floor = floors.get(name, {}).get("floor_sec")
        vs = ""
        if floor and floors[name].get("plan_hash") not in (None, fp):
            # the floor was set by a DIFFERENT physical plan — a ratio
            # against it attributes nothing (round-10 verdict: the
            # text_profile rider printed a misleading 2.7x for a round
            # against a dead plan). Record the staleness; the floor block
            # below restores the archived floor for this hash if one
            # exists, else re-baselines.
            detail[name]["stale_floor_sec"] = floor
            detail[name]["stale_floor_plan"] = floors[name].get("plan_hash")
            known = [a["floor_sec"]
                     for a in floors[name].get("archived", [])
                     if a.get("plan_hash") == fp
                     and a.get("floor_sec") is not None]
            if known:
                # an honest idle measurement of THIS plan exists — ratio
                # against it, and the floor block restores it below
                arch = min(known)
                detail[name]["floor_sec"] = arch
                detail[name]["vs_floor"] = round(timings[name] / arch, 2)
                vs = (f" floor={arch:.3f}s (archived, "
                      f"{detail[name]['vs_floor']:.2f}x)")
            else:
                vs = f" floor=stale-plan (was {floor:.3f}s @" \
                     f"{floors[name].get('plan_hash')})"
        elif floor:
            detail[name]["floor_sec"] = floor
            detail[name]["vs_floor"] = round(timings[name] / floor, 2)
            vs = f" floor={floor:.3f}s ({detail[name]['vs_floor']:.2f}x)"
        print(f"# {name}: {timings[name]:.3f}s  plan={fp} "
              f"times={times} warm={warm_s:.2f}s cpu={cpu_s:.1f}s "
              f"gc={gc_ms}ms steal={steal_s:.1f}s{vs}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Driver contract: the FINAL stdout line is the compact headline JSON
    # ({metric, value, unit, queries, sf}) and nothing else. The per-query
    # attribution detail map (plan_hash/times/cpu_s/gc_ms/steal_s) made the
    # round-6 line outgrow the driver's stdout-tail capture and the headline
    # went unparsed — so detail now lands in BENCH_DETAIL.json next to this
    # script, keeping every attribution field without touching the contract.
    # a positional-subset run must not clobber the committed full-headline
    # attribution record — divert it to a scratch file; same for off-scale
    # runs (other sf, reduced-core scaling legs), whose detail is useful
    # but not comparable to the committed full-core sf0.1 capture
    if args.queries:
        detail_name = "BENCH_DETAIL_partial.json"
    elif not floors_on:
        detail_name = "BENCH_DETAIL_offscale.json"
    else:
        detail_name = "BENCH_DETAIL.json"
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               detail_name)
    try:
        with open(detail_path, "w") as f:
            json.dump({"sf": sf, "detail": detail}, f, indent=1, sort_keys=True)
        print(f"# detail -> {detail_path}", file=sys.stderr)
    except OSError as e:  # never let attribution break the headline
        print(f"# detail write failed: {e}", file=sys.stderr)
    # record any new floors (sf0.1, full cores only): floor = best time
    # ever measured, stamped with the plan hash that achieved it
    if floors_on:
        changed = False
        for name, best in timings.items():
            cur = floors.get(name, {})
            fp = detail[name]["plan_hash"]
            entry, action = update_floor(cur, best, fp)
            if action == "keep":
                continue
            floors[name] = entry
            changed = True
            if action == "restore":
                print(f"# restored archived floor (plan change): {name} "
                      f"{entry['floor_sec']:.3f}s @{fp} (dead floor was "
                      f"{cur.get('floor_sec'):.3f}s @{cur.get('plan_hash')})",
                      file=sys.stderr)
            elif action == "re-baseline":
                print(f"# re-baselined floor (genuinely new plan): {name} "
                      f"{best:.3f}s (was {cur.get('floor_sec'):.3f}s @"
                      f"{cur.get('plan_hash')})", file=sys.stderr)
            else:
                print(f"# new floor: {name} {best:.3f}s", file=sys.stderr)
        if changed:
            try:
                with open(FLOORS_PATH, "w") as f:
                    json.dump(floors, f, indent=1, sort_keys=True)
            except OSError as e:
                print(f"# floors write failed: {e}", file=sys.stderr)
    ex_rider = round(sum(
        RIDER_PLAIN_FLOORS.get(name, t) for name, t in timings.items()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "ex_rider_total": ex_rider,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
