"""YAML manifest contract round-trip + end-to-end compile from YAML."""

import pytest

from graflo_spark import yaml_io
from graflo_spark.compiler import compile_resource
from graflo_spark.manifest import GraphManifest, IdentityMode


MANIFEST = """
schema:
  vertices:
    - name: customer
      fields:
        - {name: c_custkey, type: int}
        - c_name
        - {name: c_acctbal, type: double}
      identity: [c_custkey]
      filters:
        AND:
          - {field: c_acctbal, op: ">", value: 0.0}
    - name: nation
      fields:
        - {name: n_nationkey, type: int}
      identity: [n_nationkey]
    - name: ptype
      fields: [p_brand, p_type]
      identity: [p_brand, p_type]
      identity_mode: hash
  edges:
    - {source: customer, target: nation, relation: located_in}
resources:
  - name: customer
    steps:
      - vertex: customer
      - vertex:
          name: nation
          mapping: {n_nationkey: c_nationkey}
          extraction_scope: mapped_only
          lookup_only: true
"""


def test_yaml_roundtrip():
    m = yaml_io.loads_manifest(MANIFEST)
    assert m.schema.vertex("customer").identity == ["c_custkey"]
    assert m.schema.vertex("ptype").identity_mode == IdentityMode.HASH
    assert m.schema.edges[0].relation == "located_in"
    assert m.resource("customer").steps[1].lookup_only

    # dict -> manifest -> dict -> manifest is stable
    d1 = yaml_io.manifest_to_dict(m)
    m2 = yaml_io.manifest_from_dict(d1)
    assert yaml_io.manifest_to_dict(m2) == d1


def test_yaml_unknown_key_fails_loudly():
    bad = MANIFEST.replace("identity: [c_custkey]", "identitty: [c_custkey]")
    with pytest.raises(ValueError, match="identitty"):
        yaml_io.loads_manifest(bad)


def test_yaml_manifest_compiles_end_to_end(spark, tables, tmp_path):
    m = yaml_io.loads_manifest(MANIFEST)
    batch = compile_resource(m.schema, m.resource("customer"), tables["customer"])
    n_pos = tables["customer"].filter("c_acctbal > 0.0").count()
    assert batch.vertices["customer"].count() == n_pos
    eid = list(batch.edges)[0]
    assert batch.edges[eid].count() == n_pos

    # file round-trip
    p = str(tmp_path / "m.yaml")
    yaml_io.save_manifest(m, p)
    m2 = yaml_io.load_manifest(p)
    assert yaml_io.manifest_to_dict(m2) == yaml_io.manifest_to_dict(m)


def test_yaml_edge_type_round_trips():
    """Edge.type (direct/indirect) survives save/load — an INDIRECT edge
    previously silently degraded to DIRECT through the YAML round-trip
    (r12 review finding); the default stays un-serialized."""
    from graflo_spark.manifest import Edge, EdgeType

    e = Edge("a", "b", relation="r", type=EdgeType.INDIRECT)
    d = yaml_io.edge_to_dict(e)
    assert d["type"] == "indirect"
    assert yaml_io.edge_from_dict(d).type is EdgeType.INDIRECT
    plain = yaml_io.edge_to_dict(Edge("a", "b"))
    assert "type" not in plain
    assert yaml_io.edge_from_dict(plain).type is EdgeType.DIRECT


def _schema_canon_full(s):
    """FULL-fidelity canonical form for YAML round-trip comparison — a
    superset of test_evolve._canon: also pins edge indexes and directed/
    type flags, since serialization loss anywhere in the payload is
    exactly the class under test (the hand-found Edge.type loss,
    commit 6884d9d, is the existence proof)."""
    def fld(fs):
        return tuple((f.name, f.type, f.item_type) for f in fs)

    def idx(ixs):
        return tuple(sorted((tuple(i.fields), i.type, i.unique, i.sparse)
                            for i in ixs))

    return (
        tuple(sorted(
            (v.name, fld(v.fields), tuple(v.identity), v.identity_mode,
             tuple(map(tuple, v.identity_funnel)),
             tuple(sorted((k, tuple(c))
                          for k, c in v.secondary_identities.items())),
             idx(v.indexes))
            for v in s.vertices)),
        tuple(sorted(
            (e.source, e.target, e.relation, e.directed, e.type,
             fld(e.properties), tuple(e.identities), idx(e.indexes))
            for e in s.edges)),
    )


def test_yaml_roundtrip_property_over_random_schemas():
    """Randomized YAML round-trip (VERDICT r12 next-item #2):
    ``loads(dumps(schema)) == schema`` (full canonical equality) over
    schemas grown by the SAME random-op generator the diff-convergence
    sweep uses, so every field the evolution surface can produce —
    funnel branches, secondary identities, unique/sparse indexes, edge
    payloads with identities and indexes, directed/INDIRECT edges —
    passes through the serializer. The committed run covers 120 seeds;
    the offline sweep (SPARK_GRAFT_YAML_SEEDS) goes deeper.

    Reference contract: manifest load/save in
    graflo/architecture/contract/manifest.py."""
    import os
    import random

    import yaml as _yaml

    from graflo_spark import evolve as ev
    from graflo_spark.manifest import Edge, EdgeType
    from tests.test_evolve import _random_op, base_schema

    counter = [0]

    def fresh(p):
        counter[0] += 1
        return f"{p}{counter[0]}"

    n = int(os.environ.get("SPARK_GRAFT_YAML_SEEDS", "120"))
    for seed in range(n):
        rng = random.Random(7000 + seed)
        s = base_schema()
        for _ in range(rng.randint(1, 8)):
            op = _random_op(rng, s, fresh)
            if op is None:
                continue
            s = op.apply(s)
        # sprinkle the flags the op generator can't reach: INDIRECT
        # edges, undirected edges, edge identities, LIST-typed fields,
        # sparse indexes
        from graflo_spark.manifest import Field, FieldType, IndexConfig

        for e in s.edges:
            if rng.random() < 0.3:
                e.type = EdgeType.INDIRECT
            if rng.random() < 0.3:
                e.directed = False
            if e.properties and rng.random() < 0.5:
                e.identities = [e.properties[0].name]
            if rng.random() < 0.2:
                e.properties.append(Field(
                    fresh("arr"), FieldType.LIST, FieldType.DOUBLE))
        for v in s.vertices:
            if rng.random() < 0.2:
                v.fields.append(Field(
                    fresh("arr"), FieldType.LIST, FieldType.STRING))
            if v.indexes and rng.random() < 0.3:
                i = v.indexes[0]
                v.indexes[0] = IndexConfig(i.fields, i.type, i.unique,
                                           sparse=True)
        m = GraphManifest(schema=s, resources=[])
        text = _yaml.safe_dump(yaml_io.manifest_to_dict(m), sort_keys=False)
        m2 = yaml_io.loads_manifest(text)
        assert _schema_canon_full(m2.schema) == _schema_canon_full(s), (
            f"seed {7000 + seed}: YAML round-trip lost schema content")
        # and the serialized form itself is stable (no flapping defaults)
        assert yaml_io.manifest_to_dict(m2) == yaml_io.manifest_to_dict(m), (
            f"seed {7000 + seed}: dict form not stable through reload")
