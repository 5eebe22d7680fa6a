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
