"""Cross-resource vertex identity discovery (reference
graflo/db/cross_resource_identity.py).

Given two or more resources that may describe the same vertex, propose a
shared identity policy — natural key, composite key, or per-resource
identity funnel — with the per-resource field maps and evidence behind
the choice.

**Proposal only**, and the reference's design line is preserved exactly:
fuzzy signals (column-name similarity, value overlap) are used only to
ALIGN columns; a key is only ever PROVEN by exact equality after
normalization (cross_resource_identity.py:9-14). Soft matching in the
write path would silently merge distinct entities.

Spark design: the reference scores python dict samples; here every
measurement is a distributed aggregate —
  - value overlap: per-column ``distinct()`` frames joined on the
    normalized value (two shuffles per candidate pair, each bounded by
    the column's cardinality, never a cross join);
  - key proof: ``count == count_distinct(struct(key))`` per resource, one
    hash-aggregate pass per probe (same machinery as
    :func:`graflo_spark.infer.column_uniqueness`);
  - name similarity stays driver-side — column NAMES are metadata.
Only counts ever reach the driver.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from difflib import SequenceMatcher

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from graflo_spark.infer import column_uniqueness, propose_identity

_TOKEN_SPLIT = re.compile(r"[^a-z0-9]+")
_PHONE_HINT = re.compile(r"(?i)(phone|tel|mobile|msisdn)")
_UUID_RE = (
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-"
    "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)


def name_similarity(left: str, right: str) -> float:
    """Column-name similarity in [0,1] (reference :102-117): token-set
    Jaccard catches ``customer_email`` vs ``email_address``; the character
    ratio catches ``phone`` vs ``phone_no``; the better of the two wins."""
    if left == right:
        return 1.0
    lt = {t for t in _TOKEN_SPLIT.split(left.lower()) if t}
    rt = {t for t in _TOKEN_SPLIT.split(right.lower()) if t}
    token_score = len(lt & rt) / len(lt | rt) if lt and rt else 0.0
    ratio = SequenceMatcher(None, left.lower(), right.lower()).ratio()
    return max(token_score, ratio)


def normalize_for_match(col: Column, digits_only: bool = False) -> Column:
    """Canonical value for equality comparison (reference :74-93): trim +
    lowercase, empty -> NULL, UUIDs case-folded, optionally digits-only for
    phone-like columns. Used ONLY for overlap scoring and key proof — never
    to decide two entities match fuzzily."""
    s = F.trim(col.cast("string"))
    s = F.when(s == "", None).otherwise(s)
    if digits_only:
        d = F.regexp_replace(s, r"\D+", "")
        return F.when(d == "", None).otherwise(d)
    return F.lower(s)


@dataclass
class ColumnAlignment:
    """A candidate correspondence between two resources' columns
    (reference :139-162)."""

    left_resource: str
    left_field: str
    right_resource: str
    right_field: str
    name_score: float
    value_jaccard: float

    @property
    def score(self) -> float:
        # value evidence dominates; names are a weak prior (reference
        # min_pair_score rationale)
        return 0.3 * self.name_score + 0.7 * self.value_jaccard

    @property
    def canonical(self) -> str:
        return min(self.left_field, self.right_field)


@dataclass
class CrossResourceConfig:
    """Conservative defaults mirroring reference
    CrossResourceIdentityConfig (:164-194)."""

    min_name_score: float = 0.35  # prefilter before paying the value join
    min_value_jaccard: float = 0.1
    min_pair_score: float = 0.5
    max_key_width: int = 3
    max_alignments: int = 20


@dataclass
class CrossResourceIdentityProposal:
    """A reviewable identity policy for one vertex across resources
    (reference :209-236)."""

    vertex_name: str
    strategy: str = "no_viable_identity"  # natural|composite|funnel|no_viable_identity
    identity: list[str] = dc_field(default_factory=list)
    funnel: list[list[str]] = dc_field(default_factory=list)
    confidence: float = 0.0
    alignments: list[ColumnAlignment] = dc_field(default_factory=list)
    resource_field_maps: dict[str, dict[str, str]] = dc_field(default_factory=dict)
    evidence: dict = dc_field(default_factory=dict)
    reason: str = ""


def value_jaccard(
    left: DataFrame, left_field: str, right: DataFrame, right_field: str
) -> float:
    """Distributed Jaccard of two columns' normalized distinct values:
    |A ∩ B| via an inner join of the two distinct sets, |A ∪ B| = |A| +
    |B| - |A ∩ B|. Phone-like column pairs compare digits-only."""
    digits = bool(_PHONE_HINT.search(left_field)) and bool(
        _PHONE_HINT.search(right_field)
    )
    a = left.select(
        normalize_for_match(F.col(left_field), digits).alias("v")
    ).na.drop().distinct()
    b = right.select(
        normalize_for_match(F.col(right_field), digits).alias("v")
    ).na.drop().distinct()
    na, nb, inter = (
        a.count(), b.count(), a.join(b, "v").count()
    )
    union = na + nb - inter
    return inter / union if union else 0.0


class CrossResourceIdentityInferencer:
    """Propose a shared identity for a vertex described by several
    resources (reference :238-337)."""

    def __init__(self, config: CrossResourceConfig | None = None):
        self.config = config or CrossResourceConfig()

    def infer(
        self,
        resources: dict[str, DataFrame],
        vertex_name: str = "entity",
    ) -> CrossResourceIdentityProposal:
        cfg = self.config
        if len(resources) < 2:
            return CrossResourceIdentityProposal(
                vertex_name,
                reason="cross-resource inference needs at least two resources",
            )
        alignments = self._align(resources, cfg)
        if not alignments:
            return CrossResourceIdentityProposal(
                vertex_name, alignments=[],
                reason="no column pairs cleared the alignment thresholds",
            )
        field_maps = self._canonical_field_maps(alignments)
        projected = {
            name: df.select(*[
                F.col(src).alias(dst)
                for src, dst in field_maps.get(name, {}).items()
            ])
            for name, df in resources.items()
            if field_maps.get(name)
        }
        shared = sorted(
            set.intersection(*(set(df.columns) for df in projected.values()))
        )
        evidence: dict = {"resources": sorted(resources), "shared_fields": shared}
        key = self._search_shared_key(projected, shared, cfg)
        if key is not None:
            uniq = {
                name: self._uniqueness(df, key) for name, df in projected.items()
            }
            evidence["uniqueness_by_resource"] = uniq
            return CrossResourceIdentityProposal(
                vertex_name,
                strategy="natural" if len(key) == 1 else "composite",
                identity=key,
                confidence=sum(a.score for a in alignments) / len(alignments),
                alignments=alignments,
                resource_field_maps=field_maps,
                evidence=evidence,
            )
        # fallback: per-resource local keys as funnel branches (reference
        # _fallback_proposal — each branch records how THAT source
        # identifies the entity)
        branches = []
        for name in sorted(resources):
            local = propose_identity(
                resources[name], max_width=cfg.max_key_width, table_name=name
            )
            if local:
                branches.append(local)
        if branches:
            return CrossResourceIdentityProposal(
                vertex_name, strategy="funnel", funnel=branches,
                confidence=sum(a.score for a in alignments) / len(alignments) / 2,
                alignments=alignments, resource_field_maps=field_maps,
                evidence=evidence,
                reason="no shared field tuple keys every resource",
            )
        return CrossResourceIdentityProposal(
            vertex_name, alignments=alignments, evidence=evidence,
            reason="no shared key and no resource keys itself",
        )

    # -- alignment --------------------------------------------------------
    def _align(
        self, resources: dict[str, DataFrame], cfg: CrossResourceConfig
    ) -> list[ColumnAlignment]:
        names = sorted(resources)
        out: list[ColumnAlignment] = []
        for i, left in enumerate(names):
            for right in names[i + 1:]:
                for lf in resources[left].columns:
                    for rf in resources[right].columns:
                        ns = name_similarity(lf, rf)
                        if ns < cfg.min_name_score:
                            continue  # don't pay the value join
                        vj = value_jaccard(
                            resources[left], lf, resources[right], rf
                        )
                        cand = ColumnAlignment(left, lf, right, rf, ns, vj)
                        if (
                            vj >= cfg.min_value_jaccard
                            and cand.score >= cfg.min_pair_score
                        ):
                            out.append(cand)
        out.sort(key=lambda a: (-a.score, a.canonical))
        return out[: cfg.max_alignments]

    @staticmethod
    def _canonical_field_maps(
        alignments: list[ColumnAlignment],
    ) -> dict[str, dict[str, str]]:
        """Aligned source column -> alphabetically-first field in the pair
        (stable across runs regardless of resource order; reference
        :417-434)."""
        maps: dict[str, dict[str, str]] = {}
        for a in alignments:
            maps.setdefault(a.left_resource, {})[a.left_field] = a.canonical
            maps.setdefault(a.right_resource, {})[a.right_field] = a.canonical
        return maps

    # -- key proof --------------------------------------------------------
    @staticmethod
    def _uniqueness(df: DataFrame, key: list[str]) -> float:
        total, distinct = df.select(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.struct(*[F.col(c) for c in key])).alias("d"),
        ).first()
        return distinct / total if total else 0.0

    def _search_shared_key(
        self,
        projected: dict[str, DataFrame],
        shared: list[str],
        cfg: CrossResourceConfig,
    ) -> list[str] | None:
        """Smallest shared tuple that keys EVERY resource (reference
        :439-495). Uniqueness is evaluated WITHIN each resource, never over
        pooled rows — the entities overlap by construction, so a good key
        necessarily repeats across resources. Greedy widening over fields
        ranked by worst-resource selectivity; then minimization."""
        if not shared:
            return None
        stats: dict[str, float] = {}
        for f in shared:
            stats[f] = min(
                self._uniqueness(df, [f]) for df in projected.values()
            )
        ranked = sorted(shared, key=lambda f: (-stats[f], f))

        def keys_every(fields: list[str]) -> bool:
            return all(
                self._uniqueness(df, fields) >= 1.0
                for df in projected.values()
            )

        selected: list[str] = []
        for f in ranked:
            selected.append(f)
            if keys_every(selected):
                break
        else:
            return None
        # drop fields that aren't needed (reference _minimize)
        minimal = list(selected)
        for f in list(selected):
            trial = [c for c in minimal if c != f]
            if trial and keys_every(trial):
                minimal = trial
        return minimal if len(minimal) <= cfg.max_key_width else None
