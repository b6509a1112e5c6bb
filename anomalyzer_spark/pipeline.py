"""High-level curation pipeline — the one-call composition of the
text-curation operators, in the order a production pretraining pipeline
runs them:

    normalize → profile/filter (length, quality, language,
    [domain-fair-normalized] top fraction) → exact dedup
    → [near-dup removal] → [duplicate-span strip] → [decontamination]
    → [PII redaction] → [windowing] → [temperature mixture]
    → [leakage-safe train/eval split] → [sequence packing]

Every stage is one of this repo's tested operators; this module adds NO
new semantics — only the canonical wiring, a config dataclass that
validates up front, and a stage-by-stage report. The composed frame is
still ONE lazy Spark plan per output (nothing is collected or cached
here), so Catalyst optimizes across stage boundaries exactly as it does
in the hand-written `curation_pipeline` registry query.

Scale notes are the operators' own (see each docstring): map-only until
dedup's hash exchange; decontam/redact/sampling add no corpus shuffle;
packing adds the one md5-shard exchange.

Streaming: run :func:`curate` inside ``foreachBatch`` for per-batch
curation (the map stages are stream-safe as-is; dedup/temperature/
packing are blocking aggregates, so per-batch scope is what a
micro-batch can mean). CROSS-batch dedup state is a different contract
— that is ``streaming.dedup_stream`` / ``streaming.minhash_stream``,
which hold the seen-hash / signature state with retention and
compaction; the batch-union-equals-offline property for foreachBatch
decontamination is pinned in tests/test_streaming.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions import decontam as _decontam
from .functions import dedup as _dedup
from .functions import packing as _packing
from .functions import quality as _quality
from .functions import sampling as _sampling
from .functions import text as _text

__all__ = ["CurationConfig", "curate", "curation_report"]


@dataclass(frozen=True)
class CurationConfig:
    """Knobs for :func:`curate`; every default is the no-op for its stage
    except normalization and exact dedup (the two passes no corpus
    should skip)."""

    text_col: str = "text"
    id_col: str = "doc_id"
    #: URL column for the domain-list gate (web.filter_by_domains with
    #: subdomain inheritance); required when curate() is passed a
    #: ``blocklist=`` frame. The gate runs FIRST — category blocks drop
    #: documents before any text work is spent on them.
    url_col: str | None = None
    #: Unicode normalization form for normalize_text (None skips it;
    #: control-byte stripping runs whenever normalize is on)
    normalize_form: str | None = "NFC"
    #: minimum text_profile quality_score (None = no quality gate)
    min_quality: float | None = None
    #: keep only the globally best fraction by quality_score
    #: (sampling.select_top_fraction — exact threshold, no global sort)
    top_fraction: float | None = None
    #: rank-normalize quality_score WITHIN this column's groups before
    #: the top_fraction cut (quality.normalize_scores — the domain-fair
    #: filter: a fixed cut on raw scores keeps whole head domains and
    #: guts tail ones because score DISTRIBUTIONS differ per domain far
    #: more than quality does). None = cut on the raw score. Requires
    #: top_fraction; the absolute min_quality gate stays on the raw
    #: score (its [0,1] threshold is defined against text_profile's
    #: calibration, not a rank).
    normalize_quality_by: str | None = None
    #: minimum lexical token count (None = no length gate)
    min_tokens: int | None = None
    #: apply the published Gopher/MassiveText rule gate
    #: (quality.gopher_rules — keep only gopher_pass documents). True
    #: uses the published thresholds; a dict passes threshold overrides
    #: through (e.g. {"min_words": 20}).
    gopher: bool | dict = False
    #: code-corpus license intake gate (code.with_license_info): True
    #: keeps only permissive-licensed, non-opted-out documents
    #: (fail-closed — unknown licenses are dropped); the release-review
    #: step of a StarCoder/The-Stack-style pipeline.
    license_gate: bool = False
    #: keep only these predicted languages (None = all)
    langs: tuple[str, ...] | None = None
    #: "exact" (hash groups) or "minhash" (exact + near-dup pairs) or None
    dedup: str | None = "exact"
    #: near-dup verify threshold when dedup="minhash"
    dedup_threshold: float = 0.8
    #: near-dup group resolution: "first" (min id) or "best" (highest
    #: text_profile quality_score via dedup.keep_best)
    dedup_keep: str = "first"
    #: cross-document exact-substring dedup AFTER document dedup: strip
    #: duplicated word runs >= this many words, one canonical copy kept
    #: corpus-wide (dedup.strip_duplicate_spans). None skips.
    strip_spans: int | None = None
    #: hard per-source token budget AFTER document dedup (duplicates must
    #: not consume budget): no ``source_col`` stratum contributes more
    #: than this many lexical tokens (sampling.cap_stratum_tokens over
    #: word_token_count). None skips. Mutually exclusive with
    #: source_cap_share.
    source_cap_tokens: int | None = None
    #: relative form: no stratum may exceed this share of the deduped
    #: corpus' total lexical tokens (sampling.cap_stratum_share)
    source_cap_share: float | None = None
    source_col: str = "source"
    #: "exact" (word n-grams) / "fuzzy" (MinHash) / None; needs eval_df
    decontam_mode: str | None = None
    decontam_ngram: int = 8
    decontam_threshold: float = 0.5
    #: redact PII spans (map-only)
    redact: bool = False
    #: PII kinds for the redact pass (text.PII_PATTERNS keys); add
    #: "credit_card" (Luhn-gated) and "ssn" for the compliance-review
    #: scrubber set (C4/Dolma/FineWeb class)
    redact_kinds: tuple = ("email", "url", "ipv4", "phone")
    #: split long documents into stride-overlap token windows BEFORE
    #: mixture/packing (text.chunk_windows). (size, stride); None skips.
    #: NOTE: downstream ids become strings "<doc_id>#<chunk_idx>" so the
    #: window provenance survives sampling and packing.
    window: tuple[int, int] | None = None
    #: temperature-flatten the mixture over this column (None = skip)
    temperature_alpha: float | None = None
    domain_col: str = "lang"
    #: pack surviving docs into fixed token slots (None = return docs)
    pack_capacity: int | None = None
    pack_shards: int = 64
    #: terminal LEAKAGE-SAFE train/eval split (sampling.split_train_eval):
    #: every output row gains a ``split`` column, deterministic and
    #: nesting. With dedup="minhash" the near-dup groups mined by the
    #: dedup stage key the split hash, so a whole near-dup family lands
    #: on ONE side (window chunks of one document always do — the split
    #: hashes the base doc id). None skips.
    eval_fraction: float | None = None
    seed: int = 42

    def __post_init__(self):
        if self.dedup not in (None, "exact", "minhash"):
            raise ValueError(f"dedup must be exact|minhash|None, "
                             f"got {self.dedup!r}")
        if self.dedup_keep not in ("first", "best"):
            raise ValueError(f"dedup_keep must be first|best, "
                             f"got {self.dedup_keep!r}")
        if self.decontam_mode not in (None, "exact", "fuzzy"):
            raise ValueError(f"decontam_mode must be exact|fuzzy|None, "
                             f"got {self.decontam_mode!r}")
        if self.strip_spans is not None and self.strip_spans < 2:
            raise ValueError("strip_spans must be >= 2 words")
        if (self.source_cap_tokens is not None
                and self.source_cap_share is not None):
            raise ValueError("source_cap_tokens and source_cap_share are "
                             "mutually exclusive — pick one form")
        if self.source_cap_tokens is not None and self.source_cap_tokens < 0:
            raise ValueError("source_cap_tokens must be >= 0")
        if (self.source_cap_share is not None
                and not 0 < self.source_cap_share <= 1):
            raise ValueError("source_cap_share must be in (0, 1]")
        if self.min_quality is not None and not 0 <= self.min_quality <= 1:
            raise ValueError("min_quality must be in [0, 1]")
        if self.top_fraction is not None and not 0 < self.top_fraction <= 1:
            raise ValueError("top_fraction must be in (0, 1]")
        if self.window is not None:
            size, stride = self.window
            if size < 1 or stride < 1:
                raise ValueError("window (size, stride) must be >= 1")
        if self.normalize_quality_by is not None and self.top_fraction is None:
            raise ValueError("normalize_quality_by needs top_fraction "
                             "(it reshapes the relative cut, not the "
                             "absolute min_quality gate)")
        if self.eval_fraction is not None \
                and not 0 < self.eval_fraction < 1:
            raise ValueError("eval_fraction must be in (0, 1)")
        if self.eval_fraction is not None and self.pack_capacity is not None:
            raise ValueError(
                "eval_fraction and pack_capacity are mutually exclusive: "
                "packing mixes documents into slots, so a row-level split "
                "column cannot survive it — split first, then pack each "
                "side with its own curate()/pack_chunks call")


@dataclass
class CurationResult:
    """Stage frames, all lazy. ``output`` is packed chunks when
    ``pack_capacity`` is set, else the surviving documents."""

    stages: dict[str, DataFrame] = field(default_factory=dict)

    @property
    def output(self) -> DataFrame:
        return next(reversed(self.stages.values()))


def curate(
    docs: DataFrame,
    cfg: CurationConfig = CurationConfig(),
    *,
    eval_df: DataFrame | None = None,
    blocklist: DataFrame | None = None,
) -> CurationResult:
    """Compose the curation stack per ``cfg`` over ``docs``
    (``id_col``, ``text_col``[, ``domain_col``...]). Returns every stage
    frame under its name (``normalized``, ``filtered``, ``deduped``,
    ``span_deduped``, ``decontaminated``, ``redacted``, ``windowed``,
    ``sampled``, ``split``, ``packed``) — feed
    :func:`curation_report` for retained-count accounting, or take
    ``.output`` and write it.
    """
    if cfg.decontam_mode and eval_df is None:
        raise ValueError("decontam_mode set but no eval_df given")
    if blocklist is not None and cfg.url_col is None:
        raise ValueError("blocklist= needs cfg.url_col")
    tcol, icol = cfg.text_col, cfg.id_col
    res = CurationResult()
    cur = docs

    if blocklist is not None:
        from .functions import web as _web
        cur = _web.filter_by_domains(cur, blocklist, cfg.url_col,
                                     id_col=icol)
        res.stages["domain_gated"] = cur

    carry = [c for c in cur.columns if c not in (icol, tcol)]
    if cfg.normalize_form is not None:
        cur = _text.normalize_text(
            cur, tcol, icol, form=cfg.normalize_form, carry_cols=carry)
        res.stages["normalized"] = cur

    if cfg.gopher:
        kw = cfg.gopher if isinstance(cfg.gopher, dict) else {}
        gate = _quality.gopher_rules(cur, tcol, icol, **kw) \
            .where(F.col("gopher_pass")).select(icol)
        cur = cur.join(gate, icol, "left_semi")
        res.stages["gopher_gated"] = cur

    if cfg.license_gate:
        from .functions import code as _code
        keep = _code.with_license_info(cur, tcol) \
            .where(F.col("license_permissive")
                   & ~F.col("license_opt_out")).select(icol)
        cur = cur.join(keep, icol, "left_semi")
        res.stages["license_gated"] = cur

    if (cfg.min_quality is not None or cfg.min_tokens is not None
            or cfg.langs is not None or cfg.top_fraction is not None):
        prof = _text.text_profile(cur, tcol, icol)
        keep = prof
        if cfg.min_quality is not None:
            keep = keep.where(F.col("quality_score") >= cfg.min_quality)
        if cfg.min_tokens is not None:
            keep = keep.where(F.col("lex_tokens") >= cfg.min_tokens)
        if cfg.langs is not None:
            keep = keep.where(F.col("lang_pred").isin(*cfg.langs))
        if cfg.top_fraction is not None:
            # relative gate AFTER the absolute ones: the histogram walks
            # the survivors, so "best 30%" means of what's still eligible
            if cfg.normalize_quality_by is not None:
                # domain-fair: rank-normalize within each group first, so
                # the cut keeps the best X% OF EVERY group instead of the
                # groups whose raw scores happen to run high
                grp = cfg.normalize_quality_by
                scored = keep.select(icol, "quality_score").join(
                    cur.select(icol, grp), icol)
                normed = _quality.normalize_scores(
                    scored, "quality_score", id_col=icol, group_col=grp,
                    out_col="_norm_q")
                keep = _sampling.select_top_fraction(
                    normed.select(icol, "_norm_q"), "_norm_q",
                    cfg.top_fraction, icol, seed=cfg.seed)
            else:
                keep = _sampling.select_top_fraction(
                    keep.select(icol, "quality_score"), "quality_score",
                    cfg.top_fraction, icol, seed=cfg.seed)
        cur = cur.join(keep.select(icol), icol, "left_semi")
        res.stages["filtered"] = cur

    split_groups = None
    if cfg.dedup is not None:
        first = _dedup.exact_dedup(cur, tcol, icol).where(
            ~F.col("is_duplicate")).select(icol)
        cur = cur.join(first, icol, "left_semi")
        if cfg.dedup == "minhash":
            pairs = _dedup.minhash_lsh_pairs(
                cur, tcol, icol, threshold=cfg.dedup_threshold)
            groups = _dedup.duplicate_groups(cur, pairs, icol)
            # the same near-dup groups key the terminal leakage-safe
            # split (survivors of a partially-removed family must still
            # land on one side)
            split_groups = groups
            if cfg.dedup_keep == "best":
                # keep the HIGHEST-quality member of every near-dup group;
                # the score column gets a reserved name so a user frame
                # that already carries `quality_score` doesn't collide
                prof = _text.text_profile(cur, tcol, icol).select(
                    icol, F.col("quality_score").alias("_curate_qscore"))
                cur = _dedup.keep_best(
                    cur.join(prof, icol), groups, "_curate_qscore", icol
                ).drop("_curate_qscore")
            else:
                # keep-first: the smallest id of every component
                keep = groups.groupBy("group_id").agg(
                    F.min(icol).alias(icol)).select(icol)
                solo = cur.join(groups.select(icol), icol, "left_anti") \
                    .select(icol)
                cur = cur.join(keep.unionByName(solo), icol, "left_semi")
        res.stages["deduped"] = cur

    if cfg.source_cap_tokens is not None or cfg.source_cap_share is not None:
        # per-source token governance AFTER document dedup (duplicate
        # copies must not consume a source's budget) and BEFORE the text
        # rewrites (the budget measures what dedup let through). The
        # weight is the lexical token count — the unit the rest of the
        # stack (min_tokens, packing) already budgets in.
        from .functions.text import word_token_count
        weighted = cur.withColumn(
            "_cap_toks", word_token_count(F.col(tcol)).cast("long"))
        if cfg.source_cap_tokens is not None:
            capped = _sampling.cap_stratum_tokens(
                weighted, cfg.source_cap_tokens, cfg.source_col,
                "_cap_toks", icol, seed=cfg.seed)
        else:
            capped = _sampling.cap_stratum_share(
                weighted, cfg.source_cap_share, cfg.source_col,
                "_cap_toks", icol, seed=cfg.seed)
        cur = capped.drop("_cap_toks")
        res.stages["source_capped"] = cur

    if cfg.strip_spans is not None:
        # substring granularity AFTER document dedup (whole-document
        # copies are already gone, so the gram pass only sees the spans
        # document dedup cannot). The stage rewrites text, so it sits
        # before decontam/redact/window like the other text rewrites;
        # the standalone operator's span counters are dropped here to
        # keep the stage schema uniform (use it directly for audits).
        carry = [c for c in cur.columns if c not in (icol, tcol)]
        cur = _dedup.strip_duplicate_spans(
            cur, tcol, icol, min_len=cfg.strip_spans, carry_cols=carry,
        ).drop("n_spans_removed", "n_tokens_dropped")
        res.stages["span_deduped"] = cur

    if cfg.decontam_mode == "exact":
        cur = _decontam.decontaminate(
            cur, eval_df, text_col=tcol, id_col=icol,
            n=cfg.decontam_ngram)
        res.stages["decontaminated"] = cur
    elif cfg.decontam_mode == "fuzzy":
        cur = _decontam.fuzzy_decontaminate(
            cur, eval_df, text_col=tcol, id_col=icol,
            threshold=cfg.decontam_threshold)
        res.stages["decontaminated"] = cur

    if cfg.redact:
        carry = [c for c in cur.columns if c not in (icol, tcol)]
        cur = _text.redact_pii(cur, tcol, icol, kinds=cfg.redact_kinds,
                               carry_cols=carry)
        res.stages["redacted"] = cur

    if cfg.window is not None:
        size, stride = cfg.window
        carry = [c for c in cur.columns if c not in (icol, tcol)]
        ch = _text.chunk_windows(
            cur, tcol, icol, size=size, stride=stride, carry_cols=carry)
        cur = ch.select(
            F.concat(F.col(icol).cast("string"), F.lit("#"),
                     F.col("chunk_idx").cast("string")).alias(icol),
            F.col("chunk_text").alias(tcol),
            *[F.col(c) for c in carry],
        )
        res.stages["windowed"] = cur

    if cfg.temperature_alpha is not None:
        cur = _sampling.temperature_sample(
            cur, cfg.temperature_alpha, cfg.domain_col, icol,
            seed=cfg.seed)
        res.stages["sampled"] = cur

    if cfg.eval_fraction is not None:
        # terminal leakage-safe split: the hash key is the BASE document
        # id (window chunks carry "<doc_id>#<chunk_idx>" ids — all chunks
        # of one document land on one side), group-atomic over the
        # near-dup groups when the minhash stage mined them
        staged = cur.withColumn(
            "_split_id",
            F.substring_index(F.col(icol).cast("string"), "#", 1))
        g = None
        if split_groups is not None:
            g = split_groups.select(
                F.col(icol).cast("string").alias("_split_id"),
                F.col("group_id"))
        cur = _sampling.split_train_eval(
            staged, cfg.eval_fraction, "_split_id", groups=g,
            seed=cfg.seed).drop("_split_id")
        res.stages["split"] = cur

    if cfg.pack_capacity is not None:
        carry = [c for c in cur.columns if c not in (icol, tcol)]
        cur = _packing.pack_chunks(
            cur, cfg.pack_capacity, text_col=tcol, id_col=icol,
            n_shards=cfg.pack_shards, seed=cfg.seed, carry_cols=carry)
        res.stages["packed"] = cur

    if not res.stages:
        res.stages["input"] = cur
    return res


def curation_report(result: CurationResult) -> dict[str, int]:
    """Rows retained after each stage — one count action per stage
    (deliberately eager; run it on samples or at checkpoints, not inside
    a hot loop)."""
    return {name: df.count() for name, df in result.stages.items()}
