"""Migration planning: typed schema diff -> risk-classified ordered plan ->
executable evolution ops, plus a verified forward-only revision chain.

Reference surface: graflo/migrate/models.py (MigrationOperation /
RiskLevel / OperationType / MigrationPlan), migrate/diff.py (SchemaDiff
with identity rekey analysis), migrate/risk.py (risk classes + backward-
compatibility), migrate/planner.py (OP_ORDER + risk gate), and the
revision chain of architecture/evolution/revision.py (content-hashed
change sets whose replay is verified by before/after manifest hashes — a
git log, not an Alembic up/down pair, because several ops are lossy).

Spark design: all of this is driver-side metadata — the physical work
happens when the planned ops run through :func:`graflo_spark.evolve.
apply_plan` against a GraphStore, where each op's ``migrate`` is a
columnar read-transform-write of only the touched tables.
"""

from __future__ import annotations

import enum
import hashlib
import json
from dataclasses import dataclass, field as dc_field
from typing import Any

from graflo_spark import evolve as ev
from graflo_spark.manifest import CoreSchema, EdgeId, IdentityMode
from graflo_spark.yaml_io import edge_to_dict, vertex_to_dict


class RiskLevel(str, enum.Enum):
    LOW = "LOW"
    MEDIUM = "MEDIUM"
    HIGH = "HIGH"
    CRITICAL = "CRITICAL"


class OperationType(str, enum.Enum):
    """Canonical migration operation types (reference models.py:21-42)."""

    ADD_VERTEX = "ADD_VERTEX"
    ADD_EDGE = "ADD_EDGE"
    ADD_VERTEX_FIELD = "ADD_VERTEX_FIELD"
    ADD_EDGE_FIELD = "ADD_EDGE_FIELD"
    ADD_VERTEX_INDEX = "ADD_VERTEX_INDEX"
    ADD_EDGE_INDEX = "ADD_EDGE_INDEX"
    CHANGE_VERTEX_FIELD_TYPE = "CHANGE_VERTEX_FIELD_TYPE"
    CHANGE_EDGE_FIELD_TYPE = "CHANGE_EDGE_FIELD_TYPE"
    REMOVE_EDGE_INDEX = "REMOVE_EDGE_INDEX"
    REMOVE_VERTEX_INDEX = "REMOVE_VERTEX_INDEX"
    REMOVE_EDGE_FIELD = "REMOVE_EDGE_FIELD"
    REMOVE_VERTEX_FIELD = "REMOVE_VERTEX_FIELD"
    REMOVE_EDGE = "REMOVE_EDGE"
    REMOVE_VERTEX = "REMOVE_VERTEX"
    CHANGE_EDGE_IDENTITY = "CHANGE_EDGE_IDENTITY"
    CHANGE_VERTEX_IDENTITY = "CHANGE_VERTEX_IDENTITY"
    CHANGE_SECONDARY_IDENTITY = "CHANGE_SECONDARY_IDENTITY"
    REKEY_VERTEX = "REKEY_VERTEX"
    CHANGE_INDEX = "CHANGE_INDEX"


# ------------------------------------------------------------------ risk

LOW_RISK_OPS = {
    OperationType.ADD_VERTEX,
    OperationType.ADD_EDGE,
    OperationType.ADD_VERTEX_FIELD,
    OperationType.ADD_EDGE_FIELD,
    OperationType.ADD_VERTEX_INDEX,
    OperationType.ADD_EDGE_INDEX,
}

MEDIUM_RISK_OPS = {
    OperationType.REMOVE_VERTEX_INDEX,
    OperationType.REMOVE_EDGE_INDEX,
    OperationType.CHANGE_INDEX,
    # lookup-plane only: secondary identities never key an upsert
    OperationType.CHANGE_SECONDARY_IDENTITY,
}

HIGH_RISK_OPS = {
    OperationType.REMOVE_VERTEX_FIELD,
    OperationType.REMOVE_EDGE_FIELD,
    OperationType.CHANGE_VERTEX_FIELD_TYPE,
    OperationType.CHANGE_EDGE_FIELD_TYPE,
    OperationType.REMOVE_VERTEX,
    OperationType.REMOVE_EDGE,
}

CRITICAL_RISK_OPS = {
    OperationType.CHANGE_VERTEX_IDENTITY,
    OperationType.CHANGE_EDGE_IDENTITY,
    OperationType.REKEY_VERTEX,
}


def classify_operation(op_type: OperationType) -> RiskLevel:
    """Reference risk.py:41-52."""
    if op_type in LOW_RISK_OPS:
        return RiskLevel.LOW
    if op_type in MEDIUM_RISK_OPS:
        return RiskLevel.MEDIUM
    if op_type in HIGH_RISK_OPS:
        return RiskLevel.HIGH
    if op_type in CRITICAL_RISK_OPS:
        return RiskLevel.CRITICAL
    return RiskLevel.MEDIUM


@dataclass
class MigrationOperation:
    """A typed operation emitted from schema diff (reference models.py:45)."""

    op_type: OperationType
    target: str
    old_value: Any = None
    new_value: Any = None
    risk: RiskLevel = RiskLevel.MEDIUM
    reversible: bool = True
    metadata: dict[str, Any] = dc_field(default_factory=dict)


@dataclass
class SchemaConflict:
    key: str
    message: str
    risk: RiskLevel = RiskLevel.MEDIUM


@dataclass
class SchemaDiffResult:
    operations: list[MigrationOperation] = dc_field(default_factory=list)
    conflicts: list[SchemaConflict] = dc_field(default_factory=list)
    warnings: list[str] = dc_field(default_factory=list)


@dataclass
class MigrationPlan:
    operations: list[MigrationOperation] = dc_field(default_factory=list)
    blocked_operations: list[MigrationOperation] = dc_field(default_factory=list)
    warnings: list[str] = dc_field(default_factory=list)

    def is_empty(self) -> bool:
        return not self.operations and not self.blocked_operations


def is_low_risk(op: MigrationOperation) -> bool:
    return op.risk is RiskLevel.LOW


def is_backward_compatible_operations(ops: list[MigrationOperation]) -> bool:
    """A migration is backward compatible when all ops are additive low-risk
    (reference risk.py:60)."""
    return all(is_low_risk(op) for op in ops)


# ------------------------------------------------------------------ diff

def _identity_state(v) -> dict[str, Any]:
    return {
        "mode": v.identity_mode.value,
        "identity": list(v.identity),
        "identity_funnel": [list(b) for b in v.identity_funnel],
    }


def _requires_rekey(old: dict[str, Any], new: dict[str, Any]) -> bool:
    """Whether stored vertex keys become invalid under the new identity
    (reference diff.py:215-236): a mode change always invalidates; hash-mode
    changes to digest inputs / funnel invalidate; natural-to-natural only
    invalidates when the new key is not a superset of the old one."""
    if old["mode"] != new["mode"]:
        return True
    if new["mode"] == IdentityMode.HASH.value:
        return (
            old["identity"] != new["identity"]
            or old["identity_funnel"] != new["identity_funnel"]
        )
    if new["mode"] != IdentityMode.NATURAL.value:
        return False
    return not set(old["identity"]).issubset(set(new["identity"]))


class SchemaDiff:
    """Structural diff emitting typed, risk-classified operations
    (reference migrate/diff.py)."""

    def __init__(self, schema_old: CoreSchema, schema_new: CoreSchema):
        self.old = schema_old
        self.new = schema_new
        self._result: SchemaDiffResult | None = None

    @staticmethod
    def _op(
        op_type: OperationType,
        target: str,
        old_value: Any = None,
        new_value: Any = None,
        reversible: bool = True,
        **metadata: Any,
    ) -> MigrationOperation:
        return MigrationOperation(
            op_type=op_type,
            target=target,
            old_value=old_value,
            new_value=new_value,
            risk=classify_operation(op_type),
            reversible=reversible,
            metadata=metadata,
        )

    def compare(self) -> SchemaDiffResult:
        ops: list[MigrationOperation] = []
        conflicts: list[SchemaConflict] = []
        ops += self._diff_vertices(conflicts)
        ops += self._diff_edges(conflicts)
        self._result = SchemaDiffResult(operations=ops, conflicts=conflicts)
        return self._result

    def operations(self) -> list[MigrationOperation]:
        if self._result is None:
            self.compare()
        return self._result.operations

    def is_backward_compatible(self) -> bool:
        return is_backward_compatible_operations(self.operations())

    def risk_assessment(self) -> dict[str, str]:
        return {
            f"{op.op_type.value}:{op.target}": op.risk.value
            for op in self.operations()
        }

    # -- vertices ----------------------------------------------------------
    def _diff_vertices(self, conflicts: list[SchemaConflict]) -> list[MigrationOperation]:
        ops: list[MigrationOperation] = []
        old_names, new_names = set(self.old.vertex_names), set(self.new.vertex_names)
        for name in sorted(new_names - old_names):
            ops.append(self._op(
                OperationType.ADD_VERTEX, name,
                new_value=vertex_to_dict(self.new.vertex(name)),
            ))
        for name in sorted(old_names - new_names):
            ops.append(self._op(
                OperationType.REMOVE_VERTEX, name,
                old_value=vertex_to_dict(self.old.vertex(name)),
                reversible=False,
            ))
        for name in sorted(old_names & new_names):
            ov, nv = self.old.vertex(name), self.new.vertex(name)
            of = {f.name: (f.type, f.item_type) for f in ov.fields}
            nf = {f.name: (f.type, f.item_type) for f in nv.fields}
            for fname in sorted(set(nf) - set(of)):
                ops.append(self._op(
                    OperationType.ADD_VERTEX_FIELD, f"{name}.{fname}",
                    new_value=nf[fname][0].value if nf[fname][0] else None,
                ))
            for fname in sorted(set(of) - set(nf)):
                ops.append(self._op(
                    OperationType.REMOVE_VERTEX_FIELD, f"{name}.{fname}",
                    old_value=of[fname][0].value if of[fname][0] else None,
                    reversible=False,
                ))
            for fname in sorted(set(of) & set(nf)):
                if of[fname] != nf[fname]:
                    ops.append(self._op(
                        OperationType.CHANGE_VERTEX_FIELD_TYPE, f"{name}.{fname}",
                        old_value=of[fname][0].value if of[fname][0] else None,
                        new_value=nf[fname][0].value if nf[fname][0] else None,
                        reversible=False,
                    ))
            old_id, new_id = _identity_state(ov), _identity_state(nv)
            if old_id != new_id:
                rekey = _requires_rekey(old_id, new_id)
                ops.append(self._op(
                    OperationType.REKEY_VERTEX if rekey
                    else OperationType.CHANGE_VERTEX_IDENTITY,
                    name, old_value=old_id, new_value=new_id, reversible=False,
                ))
                if rekey:
                    conflicts.append(SchemaConflict(
                        key=name,
                        message=(
                            f"identity change on {name!r} invalidates stored "
                            "keys; existing edges must be re-resolved"
                        ),
                        risk=RiskLevel.CRITICAL,
                    ))
            if ov.secondary_identities != nv.secondary_identities:
                ops.append(self._op(
                    OperationType.CHANGE_SECONDARY_IDENTITY, name,
                    old_value=dict(ov.secondary_identities),
                    new_value=dict(nv.secondary_identities),
                ))
            oi = {i.fields for i in ov.indexes}
            ni = {i.fields for i in nv.indexes}
            for fields in sorted(ni - oi):
                ops.append(self._op(
                    OperationType.ADD_VERTEX_INDEX, f"{name}.{','.join(fields)}",
                    new_value=list(fields),
                ))
            for fields in sorted(oi - ni):
                ops.append(self._op(
                    OperationType.REMOVE_VERTEX_INDEX, f"{name}.{','.join(fields)}",
                    old_value=list(fields),
                ))
        return ops

    # -- edges -------------------------------------------------------------
    def _diff_edges(self, conflicts: list[SchemaConflict]) -> list[MigrationOperation]:
        ops: list[MigrationOperation] = []
        old_e = {e.edge_id: e for e in self.old.edges}
        new_e = {e.edge_id: e for e in self.new.edges}
        for eid in sorted(set(new_e) - set(old_e), key=str):
            ops.append(self._op(
                OperationType.ADD_EDGE, str(eid),
                new_value=edge_to_dict(new_e[eid]),
            ))
        for eid in sorted(set(old_e) - set(new_e), key=str):
            ops.append(self._op(
                OperationType.REMOVE_EDGE, str(eid),
                old_value=edge_to_dict(old_e[eid]), reversible=False,
            ))
        for eid in sorted(set(old_e) & set(new_e), key=str):
            oe, ne = old_e[eid], new_e[eid]
            of = {f.name: (f.type, f.item_type) for f in oe.properties}
            nf = {f.name: (f.type, f.item_type) for f in ne.properties}
            for fname in sorted(set(nf) - set(of)):
                ops.append(self._op(
                    OperationType.ADD_EDGE_FIELD, f"{eid}.{fname}",
                    new_value=nf[fname][0].value if nf[fname][0] else None,
                ))
            for fname in sorted(set(of) - set(nf)):
                ops.append(self._op(
                    OperationType.REMOVE_EDGE_FIELD, f"{eid}.{fname}",
                    old_value=of[fname][0].value if of[fname][0] else None,
                    reversible=False,
                ))
            for fname in sorted(set(of) & set(nf)):
                if of[fname] != nf[fname]:
                    ops.append(self._op(
                        OperationType.CHANGE_EDGE_FIELD_TYPE, f"{eid}.{fname}",
                        old_value=of[fname][0].value if of[fname][0] else None,
                        new_value=nf[fname][0].value if nf[fname][0] else None,
                        reversible=False,
                    ))
            if oe.identities != ne.identities:
                ops.append(self._op(
                    OperationType.CHANGE_EDGE_IDENTITY, str(eid),
                    old_value=list(oe.identities), new_value=list(ne.identities),
                    reversible=False,
                ))
            oi = {i.fields for i in oe.indexes}
            ni = {i.fields for i in ne.indexes}
            for fields in sorted(ni - oi):
                ops.append(self._op(
                    OperationType.ADD_EDGE_INDEX, f"{eid}.{','.join(fields)}",
                    new_value=list(fields),
                ))
            for fields in sorted(oi - ni):
                ops.append(self._op(
                    OperationType.REMOVE_EDGE_INDEX, f"{eid}.{','.join(fields)}",
                    old_value=list(fields),
                ))
        return ops


# ---------------------------------------------------------------- planner

# Contract-parity constants: these priorities reproduce the reference's
# migration ordering semantics (graflo migrate/planner.py OP_ORDER, including
# the idiosyncratic 105 slot for secondary-identity changes) — matching the
# published ordering contract is the point; the planner below is an
# independent implementation.
OP_ORDER = {
    OperationType.ADD_VERTEX: 10,
    OperationType.ADD_EDGE: 20,
    OperationType.ADD_VERTEX_FIELD: 30,
    OperationType.ADD_EDGE_FIELD: 40,
    OperationType.ADD_VERTEX_INDEX: 50,
    OperationType.ADD_EDGE_INDEX: 60,
    OperationType.CHANGE_VERTEX_FIELD_TYPE: 70,
    OperationType.CHANGE_EDGE_FIELD_TYPE: 80,
    OperationType.REMOVE_EDGE_INDEX: 90,
    OperationType.REMOVE_VERTEX_INDEX: 100,
    OperationType.CHANGE_SECONDARY_IDENTITY: 105,
    OperationType.REMOVE_EDGE_FIELD: 110,
    OperationType.REMOVE_VERTEX_FIELD: 120,
    OperationType.REMOVE_EDGE: 130,
    OperationType.REMOVE_VERTEX: 140,
    OperationType.CHANGE_EDGE_IDENTITY: 150,
    OperationType.CHANGE_VERTEX_IDENTITY: 160,
    OperationType.REKEY_VERTEX: 170,
}

# Execution phases, in run order. Each op type belongs to exactly one phase;
# phases make the grow-before-shrink invariant explicit (additive DDL can
# never be sequenced after a destructive drop, whatever the priorities say).
_PHASES = ("grow", "reshape", "shrink", "rekey")
_PHASE_CEILINGS = {"grow": 60, "reshape": 105, "shrink": 140}  # else: rekey


def _phase_of(op: MigrationOperation) -> str:
    pri = OP_ORDER.get(op.op_type, 9999)
    for phase in _PHASES[:-1]:
        if pri <= _PHASE_CEILINGS[phase]:
            return phase
    return "rekey"


class MigrationPlanner:
    """Order a diff into an execution plan with a risk gate: additive ops
    first, destructive last, identity rekeys at the very end; non-low-risk
    ops are blocked unless explicitly allowed. Ordering parity with the
    reference is pinned by tests/test_migrate.py; the phase decomposition
    (grow -> reshape -> shrink -> rekey) is this engine's own."""

    def __init__(self, allow_high_risk: bool = False):
        self.allow_high_risk = allow_high_risk

    def build(self, diff_result: SchemaDiffResult) -> MigrationPlan:
        buckets: dict[str, list[MigrationOperation]] = {p: [] for p in _PHASES}
        blocked: list[MigrationOperation] = []
        for op in diff_result.operations:
            if is_low_risk(op) or self.allow_high_risk:
                buckets[_phase_of(op)].append(op)
            else:
                blocked.append(op)

        operations: list[MigrationOperation] = []
        for phase in _PHASES:
            phase_ops = buckets[phase]
            phase_ops.sort(key=lambda op: op.target)
            phase_ops.sort(key=lambda op: OP_ORDER.get(op.op_type, 9999))
            operations.extend(phase_ops)
        blocked.sort(key=lambda op: op.target)
        blocked.sort(key=lambda op: OP_ORDER.get(op.op_type, 9999))

        warnings = list(diff_result.warnings)
        if blocked:
            warnings.append(
                "High-risk operations are blocked by default; re-plan with "
                "allow_high_risk=True to include them."
            )
        return MigrationPlan(
            operations=operations, blocked_operations=blocked, warnings=warnings
        )


def _parse_edge_target(target: str) -> EdgeId:
    src, rel, tgt = target.split("__")
    return EdgeId(src, tgt, None if rel == "edge" else rel)


def to_evolution_ops(
    plan: MigrationPlan, old: CoreSchema, new: CoreSchema
) -> list[ev.EvolutionOp]:
    """Translate a planned operation list into executable evolution ops —
    the bridge from the metadata plan to :func:`evolve.apply_plan`, which
    performs the columnar store migrations."""
    out: list[ev.EvolutionOp] = []
    for op in plan.operations:
        t = op.op_type
        if t is OperationType.ADD_VERTEX:
            out.append(ev.AddVertexOp(copy_vertex(new, op.target)))
        elif t is OperationType.REMOVE_VERTEX:
            out.append(ev.RemoveVertexOp(op.target))
        elif t is OperationType.ADD_VERTEX_FIELD:
            vname, fname = op.target.rsplit(".", 1)
            f = [f for f in new.vertex(vname).fields if f.name == fname][0]
            out.append(ev.AddPropertyOp(vname, f))
        elif t is OperationType.REMOVE_VERTEX_FIELD:
            vname, fname = op.target.rsplit(".", 1)
            out.append(ev.RemovePropertyOp(vname, fname))
        elif t is OperationType.CHANGE_VERTEX_FIELD_TYPE:
            vname, fname = op.target.rsplit(".", 1)
            f = [f for f in new.vertex(vname).fields if f.name == fname][0]
            out.append(ev.ChangeFieldTypesOp(
                vertices={vname: {fname: (f.type, f.item_type)}}
            ))
        elif t in (OperationType.CHANGE_VERTEX_IDENTITY, OperationType.REKEY_VERTEX):
            nv = new.vertex(op.target)
            out.append(ev.ReplaceIdentityOp(
                op.target, list(nv.identity), mode=nv.identity_mode,
                funnel=[list(b) for b in nv.identity_funnel], retire="keep",
            ))
        elif t is OperationType.CHANGE_SECONDARY_IDENTITY:
            ov, nv = old.vertex(op.target), new.vertex(op.target)
            gone = [k for k in ov.secondary_identities
                    if k not in nv.secondary_identities]
            added = {
                k: cols for k, cols in nv.secondary_identities.items()
                if k not in ov.secondary_identities
            }
            if gone:
                out.append(ev.RemoveSecondaryIdentitiesOp({op.target: gone}))
            if added:
                out.append(ev.AddSecondaryIdentitiesOp({op.target: added}))
        elif t is OperationType.ADD_VERTEX_INDEX:
            vname, fields = op.target.rsplit(".", 1)
            idx = [i for i in new.vertex(vname).indexes
                   if i.fields == tuple(fields.split(","))][0]
            out.append(ev.AddIndexOp(vertex=vname, index=idx))
        elif t is OperationType.REMOVE_VERTEX_INDEX:
            vname, fields = op.target.rsplit(".", 1)
            out.append(ev.RemoveIndexOp(
                vertex=vname, fields=tuple(fields.split(","))
            ))
        elif t is OperationType.ADD_EDGE:
            eid = _parse_edge_target(op.target)
            e = [e for e in new.edges if e.edge_id == eid][0]
            out.append(ev.AddEdgeOp(e))
        elif t is OperationType.REMOVE_EDGE:
            out.append(ev.RemoveEdgeOp(_parse_edge_target(op.target)))
        elif t is OperationType.ADD_EDGE_FIELD:
            eid_s, fname = op.target.rsplit(".", 1)
            eid = _parse_edge_target(eid_s)
            e = [e for e in new.edges if e.edge_id == eid][0]
            f = [f for f in e.properties if f.name == fname][0]
            if e.relation:
                out.append(ev.AddEdgePropertiesOp({e.relation: [f]}))
        elif t is OperationType.REMOVE_EDGE_FIELD:
            eid_s, fname = op.target.rsplit(".", 1)
            eid = _parse_edge_target(eid_s)
            if eid.relation:
                out.append(ev.RemoveEdgePropertiesOp({eid.relation: [fname]}))
        elif t is OperationType.CHANGE_EDGE_FIELD_TYPE:
            eid_s, fname = op.target.rsplit(".", 1)
            eid = _parse_edge_target(eid_s)
            e = [e for e in new.edges if e.edge_id == eid][0]
            f = [f for f in e.properties if f.name == fname][0]
            if e.relation:
                out.append(ev.ChangeFieldTypesOp(
                    edges={e.relation: {fname: (f.type, f.item_type)}}
                ))
        elif t is OperationType.CHANGE_EDGE_IDENTITY:
            eid = _parse_edge_target(op.target)
            out.append(ev.ReplaceEdgeIdentitiesOp({eid: list(op.new_value or [])}))
        # index CHANGE / edge-index ops fall through: AddIndexOp covers the
        # edge case via edge_id, and CHANGE_INDEX never comes out of compare()
    # Executable-order fixup (same defect class as evolve.diff's r12 fix):
    # the published OP_ORDER runs REMOVE_VERTEX_FIELD (120) before the
    # identity ops (160/170), but RemovePropertyOp refuses to drop a column
    # that is STILL the identity — an identity swap that also drops the old
    # key column would raise at apply time. Hoist each vertex's
    # ReplaceIdentityOp ahead of the first removal of an old-identity
    # column; the MigrationPlan itself keeps the reference ordering, only
    # the executable translation reorders.
    for v in {op.vertex for op in out if isinstance(op, ev.ReplaceIdentityOp)}:
        old_ident = (set(old.vertex(v).identity)
                     if v in old.vertex_names else set())
        first_rm = next(
            (i for i, op in enumerate(out)
             if isinstance(op, ev.RemovePropertyOp)
             and op.vertex == v and op.prop in old_ident), None)
        rep_i = next(i for i, op in enumerate(out)
                     if isinstance(op, ev.ReplaceIdentityOp)
                     and op.vertex == v)
        if first_rm is not None and rep_i > first_rm:
            out.insert(first_rm, out.pop(rep_i))
    return out


def copy_vertex(schema: CoreSchema, name: str):
    import copy as _copy

    return _copy.deepcopy(schema.vertex(name))


# --------------------------------------------------------------- revisions

def schema_hash(schema: CoreSchema) -> str:
    """Content hash of a schema: canonical JSON over the YAML-dict form
    (reference migrate/io.py manifest_hash / evolution/hashing.py)."""
    payload = {
        "vertices": [vertex_to_dict(v) for v in schema.vertices],
        "edges": [edge_to_dict(e) for e in schema.edges],
    }
    blob = json.dumps(payload, sort_keys=True, separators=(",", ":"), default=str)
    return hashlib.sha256(blob.encode()).hexdigest()


REVISION_ID_LENGTH = 12


class RevisionError(RuntimeError):
    """A chain is malformed, or a replay did not reproduce a recorded hash."""


@dataclass
class Revision:
    """One content-hashed change set (reference evolution/revision.py):
    records the schema hash before and after, so replay is VERIFIED rather
    than assumed."""

    revision_id: str
    slug: str
    ops: list[ev.EvolutionOp]
    hash_before: str
    hash_after: str
    parent: str | None = None


@dataclass
class RevisionChain:
    """Forward-only chain over a base schema — a git log, not an Alembic
    up/down pair (several evolution ops are lossy, and a downgrade that
    silently produces a different schema is worse than none). Going back =
    replaying from the base up to the revision you want."""

    base_hash: str
    revisions: list[Revision] = dc_field(default_factory=list)

    def head(self) -> str | None:
        return self.revisions[-1].revision_id if self.revisions else None

    def create_revision(
        self, current: CoreSchema, ops: list[ev.EvolutionOp], slug: str = ""
    ) -> tuple[Revision, CoreSchema]:
        """Apply ``ops`` to ``current`` and append a verified revision."""
        before = schema_hash(current)
        expect = self.revisions[-1].hash_after if self.revisions else self.base_hash
        if before != expect:
            raise RevisionError(
                f"current schema hash {before[:12]} does not match chain head "
                f"{expect[:12]}"
            )
        evolved = current
        for op in ops:
            evolved = op.apply(evolved)
        after = schema_hash(evolved)
        rid = hashlib.sha256(
            f"{self.head()}:{before}:{after}:{slug}".encode()
        ).hexdigest()[:REVISION_ID_LENGTH]
        rev = Revision(
            revision_id=rid, slug=slug, ops=list(ops),
            hash_before=before, hash_after=after, parent=self.head(),
        )
        self.revisions.append(rev)
        return rev, evolved

    def replay(
        self, base: CoreSchema, upto: str | None = None, store=None
    ) -> CoreSchema:
        """Replay the chain from the base, verifying every recorded hash;
        with ``store`` the physical migrations run too."""
        if schema_hash(base) != self.base_hash:
            raise RevisionError("base schema does not match chain base hash")
        schema = base
        for rev in self.revisions:
            if schema_hash(schema) != rev.hash_before:
                raise RevisionError(
                    f"replay diverged before revision {rev.revision_id}"
                )
            schema = ev.apply_plan(schema, rev.ops, store=store)
            if schema_hash(schema) != rev.hash_after:
                raise RevisionError(
                    f"revision {rev.revision_id} did not reproduce its "
                    "recorded hash"
                )
            if upto is not None and rev.revision_id == upto:
                return schema
        if upto is not None:
            raise RevisionError(f"unknown revision {upto!r}")
        return schema
