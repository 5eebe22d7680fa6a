"""Migration planner / risk / revision chain tests (mirrors the reference's
test/migrate/test_diff.py, test_diff_identity.py, test_planner.py and
test/architecture/test_evolution_revision.py semantics)."""

import pytest
from pyspark.sql import functions as F

from graflo_spark import evolve as ev
from graflo_spark import migrate as mg
from graflo_spark.manifest import (
    CoreSchema, Edge, EdgeId, Field, FieldType, IdentityMode, IndexConfig, Vertex,
)
from graflo_spark.store import GraphStore


def old_schema() -> CoreSchema:
    return CoreSchema(
        vertices=[
            Vertex("person", [Field("pid", FieldType.INT), Field("name")],
                   identity=["pid"]),
            Vertex("city", [Field("cid", FieldType.INT)], identity=["cid"]),
        ],
        edges=[Edge("person", "city", relation="lives_in",
                    properties=[Field("since", FieldType.INT)])],
    )


def test_diff_detects_structural_changes():
    new = CoreSchema(
        vertices=[
            Vertex("person",
                   [Field("pid", FieldType.INT), Field("name"), Field("age", FieldType.INT)],
                   identity=["pid"]),
            Vertex("country", [Field("code")], identity=["code"]),
        ],
        edges=[Edge("person", "country", relation="citizen_of")],
    )
    ops = mg.SchemaDiff(old_schema(), new).operations()
    kinds = {(op.op_type, op.target) for op in ops}
    assert (mg.OperationType.ADD_VERTEX, "country") in kinds
    assert (mg.OperationType.REMOVE_VERTEX, "city") in kinds
    assert (mg.OperationType.ADD_VERTEX_FIELD, "person.age") in kinds
    assert (mg.OperationType.ADD_EDGE, "person__citizen_of__country") in kinds
    assert (mg.OperationType.REMOVE_EDGE, "person__lives_in__city") in kinds


def test_backward_compatibility_false_on_removal():
    additive = CoreSchema(
        vertices=old_schema().vertices + [Vertex("extra", [Field("x")], identity=["x"])],
        edges=old_schema().edges,
    )
    assert mg.SchemaDiff(old_schema(), additive).is_backward_compatible()
    removing = CoreSchema(vertices=old_schema().vertices[:1], edges=[])
    assert not mg.SchemaDiff(old_schema(), removing).is_backward_compatible()


def test_risk_assessment_populated():
    removing = CoreSchema(vertices=old_schema().vertices[:1], edges=[])
    risks = mg.SchemaDiff(old_schema(), removing).risk_assessment()
    assert risks["REMOVE_VERTEX:city"] == "HIGH"
    assert risks["REMOVE_EDGE:person__lives_in__city"] == "HIGH"


# ------------------------------------------------------------ identity diffs

def _with_identity(**kw) -> CoreSchema:
    s = old_schema()
    v = s.vertex("person")
    for k, val in kw.items():
        setattr(v, k, val)
    return s


def test_mode_change_requires_rekey():
    new = _with_identity(identity_mode=IdentityMode.HASH)
    ops = mg.SchemaDiff(old_schema(), new).operations()
    assert [op.op_type for op in ops] == [mg.OperationType.REKEY_VERTEX]
    assert ops[0].risk is mg.RiskLevel.CRITICAL
    assert ops[0].new_value["mode"] == "hash"


def test_swapping_natural_key_requires_rekey():
    new = _with_identity(identity=["name"])
    ops = mg.SchemaDiff(old_schema(), new).operations()
    assert ops[0].op_type is mg.OperationType.REKEY_VERTEX


def test_widening_composite_key_does_not_rekey():
    new = _with_identity(identity=["pid", "name"])
    ops = mg.SchemaDiff(old_schema(), new).operations()
    assert [op.op_type for op in ops] == [mg.OperationType.CHANGE_VERTEX_IDENTITY]
    assert ops[0].risk is mg.RiskLevel.CRITICAL  # identity changes stay critical


def test_funnel_reorder_rekeys():
    a = _with_identity(identity_mode=IdentityMode.HASH,
                       identity_funnel=[["pid"], ["name"]])
    b = _with_identity(identity_mode=IdentityMode.HASH,
                       identity_funnel=[["name"], ["pid"]])
    ops = mg.SchemaDiff(a, b).operations()
    assert [op.op_type for op in ops] == [mg.OperationType.REKEY_VERTEX]
    # identical funnels are an empty diff
    assert mg.SchemaDiff(a, a).operations() == []


def test_rekey_conflict_reported():
    new = _with_identity(identity_mode=IdentityMode.HASH)
    result = mg.SchemaDiff(old_schema(), new).compare()
    assert result.conflicts and result.conflicts[0].risk is mg.RiskLevel.CRITICAL


def test_secondary_identity_change_is_medium():
    new = _with_identity(secondary_identities={"by_name": ["name"]})
    ops = mg.SchemaDiff(old_schema(), new).operations()
    assert [op.op_type for op in ops] == [mg.OperationType.CHANGE_SECONDARY_IDENTITY]
    assert ops[0].risk is mg.RiskLevel.MEDIUM


# ----------------------------------------------------------------- planner

def _mixed_diff() -> mg.SchemaDiffResult:
    new = CoreSchema(
        vertices=[
            Vertex("person",
                   [Field("pid", FieldType.INT), Field("age", FieldType.INT)],
                   identity=["pid"],
                   indexes=[IndexConfig(("age",))]),
            Vertex("city", [Field("cid", FieldType.INT)], identity=["cid"]),
            Vertex("zebra", [Field("z")], identity=["z"]),
        ],
        edges=[Edge("person", "city", relation="lives_in",
                    properties=[Field("since", FieldType.INT)])],
    )
    return mg.SchemaDiff(old_schema(), new).compare()


def test_planner_orders_deterministically_and_blocks_high_risk():
    plan = mg.MigrationPlanner().build(_mixed_diff())
    # runnable: additive ops in OP_ORDER order (vertex < field < index)
    assert [op.op_type for op in plan.operations] == [
        mg.OperationType.ADD_VERTEX,
        mg.OperationType.ADD_VERTEX_FIELD,
        mg.OperationType.ADD_VERTEX_INDEX,
    ]
    # the name removal is blocked, with a warning
    assert [op.op_type for op in plan.blocked_operations] == [
        mg.OperationType.REMOVE_VERTEX_FIELD,
    ]
    assert plan.warnings and "blocked" in plan.warnings[0]
    assert not plan.is_empty()


def test_planner_keeps_high_risk_when_allowed():
    plan = mg.MigrationPlanner(allow_high_risk=True).build(_mixed_diff())
    assert not plan.blocked_operations
    # removals run after additions
    types = [op.op_type for op in plan.operations]
    assert types.index(mg.OperationType.REMOVE_VERTEX_FIELD) > types.index(
        mg.OperationType.ADD_VERTEX_INDEX)


def test_plan_executes_through_evolution_ops(spark, tables, tmp_path):
    old = CoreSchema(vertices=[
        Vertex("customer",
               [Field("c_custkey", FieldType.INT), Field("c_name"),
                Field("c_acctbal")],
               identity=["c_custkey"]),
    ])
    new = CoreSchema(vertices=[
        Vertex("customer",
               [Field("c_custkey", FieldType.INT),
                Field("c_acctbal", FieldType.DOUBLE),
                Field("c_mktsegment")],
               identity=["c_custkey"]),
    ])
    store = GraphStore(spark, str(tmp_path / "g"), old)
    store.apply_target_schema()
    store.upsert_vertices("customer", tables["customer"].select(
        "c_custkey", "c_name",
        F.col("c_acctbal").cast("string").alias("c_acctbal")))

    diff = mg.SchemaDiff(old, new).compare()
    plan = mg.MigrationPlanner(allow_high_risk=True).build(diff)
    ev_ops = mg.to_evolution_ops(plan, old, new)
    final = ev.apply_plan(old, ev_ops, store=store)

    assert "c_mktsegment" in final.vertex("customer").field_names
    assert "c_name" not in final.vertex("customer").field_names
    out = store.read_vertices("customer")
    assert "c_name" not in out.columns
    assert dict(out.dtypes)["c_acctbal"] == "double"


# ---------------------------------------------------------------- revisions

def test_revision_chain_replay_verified():
    base = old_schema()
    chain = mg.RevisionChain(base_hash=mg.schema_hash(base))
    r1, s1 = chain.create_revision(
        base, [ev.AddPropertyOp("person", Field("age", FieldType.INT))], slug="age")
    r2, s2 = chain.create_revision(
        s1, [ev.AddVertexOp(Vertex("country", [Field("code")], identity=["code"]))],
        slug="country")
    assert r2.parent == r1.revision_id
    assert len(r1.revision_id) == mg.REVISION_ID_LENGTH

    replayed = chain.replay(old_schema())
    assert mg.schema_hash(replayed) == mg.schema_hash(s2)
    partial = chain.replay(old_schema(), upto=r1.revision_id)
    assert mg.schema_hash(partial) == mg.schema_hash(s1)

    with pytest.raises(mg.RevisionError):
        chain.replay(s1)  # wrong base
    with pytest.raises(mg.RevisionError):
        chain.replay(old_schema(), upto="nope")
    with pytest.raises(mg.RevisionError):
        # stale head: creating from a schema that is not the chain head
        chain.create_revision(base, [], slug="stale")


def test_planner_identity_swap_with_column_drop_executes(spark, tables, tmp_path):
    """The planner's published OP_ORDER runs REMOVE_VERTEX_FIELD before
    the identity ops, so an identity swap that also drops the old key
    column produced an executable plan that raised 'cannot remove
    identity column' at apply time (the r12 evolve.diff defect class,
    on the SchemaDiff/MigrationPlanner path). to_evolution_ops now
    hoists the ReplaceIdentityOp ahead of the first old-identity-column
    removal; the MigrationPlan itself keeps the reference ordering."""
    old = CoreSchema(vertices=[
        Vertex("customer",
               [Field("c_custkey", FieldType.INT), Field("c_name")],
               identity=["c_custkey"]),
    ])
    new = CoreSchema(vertices=[
        Vertex("customer", [Field("c_name")], identity=["c_name"]),
    ])
    diff = mg.SchemaDiff(old, new).compare()
    plan = mg.MigrationPlanner(allow_high_risk=True).build(diff)
    ev_ops = mg.to_evolution_ops(plan, old, new)

    store = GraphStore(spark, str(tmp_path / "g"), old)
    store.apply_target_schema()
    store.upsert_vertices("customer", tables["customer"].select(
        "c_custkey", "c_name"))
    final = ev.apply_plan(old, ev_ops, store=store)
    assert final.vertex("customer").identity == ["c_name"]
    assert final.vertex("customer").field_names == ["c_name"]
    out = store.read_vertices("customer")
    assert out.columns == ["c_name"]
    assert out.count() == tables["customer"].select("c_name").distinct().count()
