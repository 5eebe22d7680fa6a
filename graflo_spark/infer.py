"""Schema & identity inference (SURVEY §1.3).

Reference behaviors re-expressed Spark-first:
    - identity-key discovery from data: uniqueness ratios + greedy composite
      key (graflo/db/identity_inference.py, db/cross_resource_identity.py) —
      here each probe is ONE hash-aggregate pass (count / count_distinct),
      so a 100 TB table costs a scan per greedy step, nothing quadratic;
    - relational 3NF inference: PK/FK heuristics classifying tables into
      vertex tables vs junction (edge) tables
      (graflo/db/postgres/schema_inference.py:24-110,
      graflo/architecture/onto_sql.py). Without catalog FK metadata we prove
      FKs from the data itself: distinct-value containment via a semi-join.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graflo_spark.manifest import CoreSchema, Edge, Field, Vertex
from graflo_spark.steps import EdgeLink, EdgeStep, ResourceConfig, VertexStep


def column_uniqueness(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column uniqueness evidence in ONE aggregate pass.

    Returns ``(column_name, n_distinct, n_nonnull, n_rows, uniqueness)``
    where ``uniqueness = n_distinct / n_rows`` (the reference's ratio; a
    column with ratio 1.0 and no nulls is a perfect natural key).
    """
    cols = cols or df.columns
    # positional aliases + quote-escaped name literals: a column named
    # "order id" (space/hyphen/quote) would otherwise make the stack()
    # expression unparseable (review finding, verified ParseException)
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.countDistinct(F.col(c)).alias(f"__d_{i}")
          for i, c in enumerate(cols)],
        *[F.count(F.col(c)).alias(f"__nn_{i}")
          for i, c in enumerate(cols)],
    )
    stack = ", ".join(
        "'{}', __d_{}, __nn_{}".format(c.replace("'", "\\'"), i, i)
        for i, c in enumerate(cols))
    return agg.selectExpr(
        "__n", f"stack({len(cols)}, {stack}) AS (column_name, n_distinct, n_nonnull)"
    ).select(
        "column_name",
        "n_distinct",
        "n_nonnull",
        F.col("__n").alias("n_rows"),
        (F.col("n_distinct").cast("double") / F.col("__n")).alias("uniqueness"),
    )


def propose_identity(
    df: DataFrame,
    candidate_cols: list[str] | None = None,
    max_width: int = 4,
    table_name: str | None = None,
) -> list[str]:
    """Greedy composite-key proposal (reference identity_inference funnel:
    start from the most selective column, extend until the combination is
    unique or ``max_width`` is hit). Returns the proposed column list; empty
    when no combination within ``max_width`` is unique.

    Each greedy step is one aggregate job; the driver only sees counts.

    Ranking (r12 fix of a verified wrong-answer heuristic): a STRICTLY
    UNIQUE no-null single column wins outright, whatever its name — the
    name prior (key-like suffix, self-table stem) only breaks ties AMONG
    unique candidates. The pre-fix ordering put key-LIKE names above
    actual uniqueness, so a non-unique ``*_id`` FK column seeded the walk
    ahead of a true unique natural key and polluted the proposal
    (``['group_id','email']`` where ``['email']`` is the key).
    """
    stats = {
        r["column_name"]: r
        for r in column_uniqueness(df, candidate_cols).collect()
    }
    if not stats:
        return []
    n_rows = next(iter(stats.values()))["n_rows"]
    if n_rows == 0:
        return []
    # Key plausibility: fractional columns are measures, not keys — a random
    # double is accidentally unique at any sample size, so it must never
    # outrank a true key. Key-like names (…key, …id) rank first: the cheap
    # stand-in for the catalog PK metadata the reference reads
    # (db/postgres/inference_utils.py); containment proof still gates FKs.
    fractional = {
        f.name for f in df.schema.fields
        if f.dataType.typeName() in ("double", "float", "decimal")
    }

    def keylike(c: str) -> int:
        low = c.lower()
        return 0 if low.endswith(("key", "id", "_id")) else 1

    def selfkey(c: str) -> int:
        """0 when the key's name stems from its own table (``s_suppkey`` in
        ``supplier``, ``customer_id`` in ``customer``) — the PK naming
        convention; an FK column (``s_nationkey``) stems from *another*
        table and must not win a tie against the true PK."""
        if not table_name:
            return 0
        t = table_name.lower()
        for base in (c.lower(), _norm_key(c).lower()):
            stem = base
            for suffix in ("key", "id"):
                stem = stem.removesuffix(suffix)
            stem = stem.rstrip("_")
            if stem and (t.startswith(stem) or stem.startswith(t)):
                return 0
        return 1

    eligible = [
        c for c, r in stats.items()
        if r["n_nonnull"] == n_rows and c not in fractional
    ]
    # a strictly-unique single column IS the key — name prior only as a
    # tie-break among unique candidates (uniqueness before names)
    unique_cols = [c for c in eligible if stats[c]["n_distinct"] == n_rows]
    if unique_cols:
        return [min(unique_cols, key=lambda c: (keylike(c), selfkey(c), c))]
    # composite walk: no single key exists, so seed from the name prior
    # (the cheap stand-in for catalog PK metadata), most selective first
    ranked = sorted(
        eligible,
        key=lambda c: (keylike(c), selfkey(c), -stats[c]["n_distinct"], c),
    )
    chosen: list[str] = []
    for c in ranked[:max_width]:
        chosen.append(c)
        if len(chosen) == 1:
            distinct = stats[c]["n_distinct"]
        else:
            distinct = df.select(*chosen).distinct().count()
        if distinct == n_rows:
            return chosen
    return []


@dataclass
class FkCandidate:
    child_table: str
    child_column: str
    parent_table: str
    parent_column: str


def fk_containment(
    tables: dict[str, DataFrame], candidates: list[FkCandidate]
) -> DataFrame:
    """Containment evidence for FK candidates, as one unioned lazy plan.

    For each candidate: ``containment`` = fraction of distinct non-null child
    values present in the parent column. A true FK scores 1.0. Each leg is a
    distinct-project + left-semi join — the parent side is distinct-projected
    first, so even a 100 TB fact table only shuffles its key column.
    """
    if not candidates:
        raise ValueError(
            "fk_containment needs at least one FkCandidate "
            "(an empty evidence frame has no schema to build)")
    parts = []
    for c in candidates:
        child = (
            tables[c.child_table]
            .select(F.col(c.child_column).alias("__v"))
            .filter(F.col("__v").isNotNull())
            .distinct()
        )
        parent = tables[c.parent_table].select(
            F.col(c.parent_column).alias("__v")
        ).distinct()
        matched = child.join(parent, "__v", "left_semi")
        parts.append(
            child.agg(F.count(F.lit(1)).alias("n_child_distinct")).crossJoin(
                matched.agg(F.count(F.lit(1)).alias("n_contained"))
            ).select(
                F.lit(c.child_table).alias("child_table"),
                F.lit(c.child_column).alias("child_column"),
                F.lit(c.parent_table).alias("parent_table"),
                F.lit(c.parent_column).alias("parent_column"),
                "n_child_distinct",
                "n_contained",
                (F.col("n_contained").cast("double") / F.col("n_child_distinct")).alias(
                    "containment"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def classify_tables(
    tables: dict[str, DataFrame],
    fk_evidence: DataFrame,
    containment_threshold: float = 0.999,
) -> DataFrame:
    """Vertex-vs-junction classification from inferred FKs (reference
    onto_sql vertex/edge(junction) table classification).

    Rule: a table with >= 2 proven FK columns and NO single-column natural
    key (no column with uniqueness 1.0) is a junction (edge) table; anything
    else is a vertex table. Returns ``(table_name, n_fks, has_unique_column,
    table_kind)``.
    """
    fks = (
        fk_evidence.filter(F.col("containment") >= containment_threshold)
        .groupBy(F.col("child_table").alias("table_name"))
        .agg(F.countDistinct("child_column").alias("n_fks"))
    )
    uniq_parts = []
    for name, df in tables.items():
        u = column_uniqueness(df).agg(
            F.max((F.col("n_distinct") == F.col("n_rows")).cast("int")).alias("u")
        )
        uniq_parts.append(
            u.select(
                F.lit(name).alias("table_name"),
                (F.col("u") == 1).alias("has_unique_column"),
            )
        )
    uniq = uniq_parts[0]
    for p in uniq_parts[1:]:
        uniq = uniq.unionByName(p)
    return (
        uniq.join(fks, "table_name", "left")
        .na.fill({"n_fks": 0})
        .select(
            "table_name",
            "n_fks",
            "has_unique_column",
            F.when(
                (F.col("n_fks") >= 2) & (~F.col("has_unique_column")),
                F.lit("junction"),
            )
            .otherwise(F.lit("vertex"))
            .alias("table_kind"),
        )
    )


# --- relational 3NF -> manifest inference (SURVEY §1.3 family 1) -----------


def _norm_key(name: str) -> str:
    """Normalize a column name for FK-candidate matching: drop the
    table-prefix segment (TPC-H style ``o_custkey``/``c_custkey`` ->
    ``custkey``; plain names pass through). The match is only a *candidate*
    generator — containment proof decides (reference reads pg catalog FKs,
    db/postgres/inference_utils.py; data-first inference must earn them)."""
    return name.split("_", 1)[1] if "_" in name else name


# bare surrogate PK names carry NO table information: every table's `id`
# normalizes to `id`, so a name match against them proves nothing and
# sequential ids make even the containment proof spurious
_SURROGATE_PK_NAMES = {"id", "key", "pk", "uuid", "guid", "rowid"}


def _singular(name: str) -> str:
    n = name.lower()
    if n.endswith("ies") and len(n) > 3:
        return n[:-3] + "y"
    if n.endswith("s") and not n.endswith("ss") and len(n) > 1:
        return n[:-1]
    return n


def _stem_matches_table(col: str, parent_table: str) -> bool:
    """``x_id``-style stem check for surrogate-PK candidates: the child
    column must NAME its parent table (``group_id`` -> ``groups``,
    singular/plural-normalized). Without this, a surrogate ``id`` PK
    cross-matches every table and sequential ids prove containment
    spuriously (r11 deferred finding #3, verified bogus users->groups
    edge on the identity column itself)."""
    stem = col.lower()
    for suf in ("_id", "_key", "_uuid", "_guid", "id", "key", "uuid"):
        if stem.endswith(suf) and len(stem) > len(suf):
            stem = stem[: -len(suf)].rstrip("_")
            break
    else:
        return False
    return bool(stem) and _singular(stem) == _singular(parent_table)


def _spark_to_field_type(dt) -> "tuple":
    from pyspark.sql import types as T

    from graflo_spark.manifest import FieldType

    scalar = {
        T.LongType(): FieldType.INT,
        T.IntegerType(): FieldType.INT,
        T.ShortType(): FieldType.INT,
        T.DoubleType(): FieldType.DOUBLE,
        T.FloatType(): FieldType.FLOAT,
        T.BooleanType(): FieldType.BOOL,
        T.StringType(): FieldType.STRING,
        T.TimestampType(): FieldType.DATETIME,
        T.DateType(): FieldType.DATETIME,
    }
    if isinstance(dt, T.ArrayType):
        item = scalar.get(dt.elementType)
        return (FieldType.LIST, item) if item else (None, None)
    return (scalar.get(dt), None)


def infer_manifest_from_tables(
    tables: dict[str, "DataFrame"],
    containment_threshold: float = 0.999,
    max_width: int = 4,
):
    """Relational-3NF manifest inference, end to end (reference
    ``GraphEngine.infer_manifest`` over postgres introspection,
    hq/graph_engine.py:184 + db/postgres/schema_inference.py:24-110 — but
    data-proven instead of catalog-read):

    1. per-table identity proposal (greedy uniqueness funnel);
    2. FK candidates by normalized-name match against single-column PKs,
       proven by distinct-containment (>= ``containment_threshold``);
    3. junction classification: >= 2 proven FKs and no unique column ->
       the table becomes pairwise edges, not a vertex;
    4. vertex tables with FKs -> one resource extracting the vertex plus a
       mapped-only endpoint vertex per FK and the connecting edge (the
       reference's auto-join shape, hq/auto_join.py:33-137).

    Returns a :class:`~graflo_spark.manifest.GraphManifest`. Spark cost: one
    uniqueness aggregate per table, one distinct-semi-join per FK candidate
    (parent side distinct-projected first), nothing quadratic in rows.
    """
    from graflo_spark.manifest import GraphManifest

    identities = {
        name: propose_identity(df, max_width=max_width, table_name=name)
        for name, df in tables.items()
    }
    single_pk = {
        name: ident[0] for name, ident in identities.items() if len(ident) == 1
    }
    candidates = []
    for child, df in tables.items():
        for col in df.columns:
            for parent, pk in single_pk.items():
                if parent == child:
                    continue
                if _norm_key(col) != _norm_key(pk):
                    continue
                if (_norm_key(pk).lower() in _SURROGATE_PK_NAMES
                        and not _stem_matches_table(col, parent)):
                    continue  # bare surrogate PK: the column must name
                    # its parent table, or the match is noise
                candidates.append(FkCandidate(child, col, parent, pk))
    proven: dict[str, list[FkCandidate]] = {name: [] for name in tables}
    if candidates:
        ev = fk_containment(tables, candidates).collect()
        by_key = {
            (r["child_table"], r["child_column"], r["parent_table"]): r["containment"]
            for r in ev
        }
        for c in candidates:
            if by_key.get((c.child_table, c.child_column, c.parent_table), 0.0) >= containment_threshold:
                proven[c.child_table].append(c)
    has_unique = {
        name: len(identities[name]) == 1 for name in tables
    }
    junctions = {
        name
        for name in tables
        if len({c.child_column for c in proven[name]}) >= 2 and not has_unique[name]
    }

    table_fields = {}
    for name in tables:
        fields = []
        for f in tables[name].schema.fields:
            t, item = _spark_to_field_type(f.dataType)
            fields.append(Field(f.name, t, item))
        table_fields[name] = fields
    return _assemble_manifest(table_fields, identities, proven, junctions)


def _assemble_manifest(
    table_fields: dict[str, list[Field]],
    identities: dict[str, list[str]],
    proven: dict[str, list[FkCandidate]],
    junctions: set[str],
):
    """Shared manifest assembly for both inference front-ends (data-proven
    tables and catalog introspection): non-junction tables become vertices
    with their FK lookup steps + edges; junction tables become pairwise
    edges between their FK endpoints."""
    from graflo_spark.manifest import GraphManifest

    vertices, edges, resources = [], [], []
    for name in sorted(table_fields):
        if name in junctions:
            continue
        vertices.append(Vertex(name, table_fields[name], identity=identities[name]))
    vertex_names = {v.name for v in vertices}

    def endpoint_steps(table: str) -> tuple[list, list]:
        """(lookup vertex steps, edge links) for a table's proven FKs."""
        vsteps, links = [], []
        for c in sorted(proven[table], key=lambda c: c.child_column):
            if c.parent_table not in vertex_names:
                continue
            vsteps.append(
                VertexStep(
                    name=c.parent_table,
                    mapping={c.parent_column: c.child_column},
                    extraction_scope="mapped_only",
                    role=c.child_column,
                )
            )
            links.append((c.parent_table, c.child_column))
        return vsteps, links

    for name in sorted(table_fields):
        if name in junctions:
            vsteps, links = endpoint_steps(name)
            steps: list = list(vsteps)
            for i in range(len(links)):
                for j in range(i + 1, len(links)):
                    (src, src_role), (tgt, tgt_role) = links[i], links[j]
                    # snake_case FK columns like user_id normalize to the
                    # degenerate 'id' — fall back to the full column name
                    # so the relation stays meaningful ('group_id_user_id',
                    # not 'id_id'); TPC-H-style prefixes are unaffected
                    parts = [
                        nk if (nk := _norm_key(c)) != "id" else c
                        for c in (links[i][1], links[j][1])
                    ]
                    rel = parts[0] + "_" + parts[1]
                    edges.append(Edge(src, tgt, relation=rel))
                    steps.append(
                        EdgeStep(
                            links=[
                                EdgeLink(
                                    source=src,
                                    target=tgt,
                                    relation=rel,
                                    source_role=src_role,
                                    target_role=tgt_role,
                                )
                            ]
                        )
                    )
            resources.append(ResourceConfig(name=name, steps=steps, infer_edges=False))
        else:
            steps = [VertexStep(name=name)]
            vsteps, links = endpoint_steps(name)
            steps += vsteps
            for tgt, role in links:
                # same degenerate-'id' fallback as the junction branch: a
                # snake_case FK like user_id must not yield relation 'id'
                # (two such FKs would collide on one relation name)
                rel = nk if (nk := _norm_key(role)) != "id" else role
                edges.append(Edge(name, tgt, relation=rel))
                steps.append(
                    EdgeStep(
                        links=[
                            EdgeLink(
                                source=name, target=tgt, relation=rel,
                                target_role=role,
                            )
                        ]
                    )
                )
            resources.append(ResourceConfig(name=name, steps=steps, infer_edges=False))
    schema = CoreSchema(vertices=vertices, edges=edges)
    return GraphManifest(schema=schema, resources=resources)


# --- information_schema (JDBC catalog) -> manifest inference ---------------

# ANSI / postgres type names -> FieldType (reference
# db/postgres/types.py PostgresTypeMapper semantics).
_SQL_FIELD_TYPES = {
    "smallint": "INT", "integer": "INT", "int": "INT", "bigint": "INT",
    "serial": "INT", "bigserial": "INT",
    "real": "FLOAT",
    "double precision": "DOUBLE", "float": "DOUBLE",
    "boolean": "BOOL",
    "text": "STRING", "uuid": "STRING", "json": "STRING", "jsonb": "STRING",
    "date": "DATETIME",
}


def _sql_to_field_type(data_type: str):
    from graflo_spark.manifest import FieldType

    t = data_type.strip().lower()
    if t.endswith("[]"):
        item = _sql_to_field_type(t[:-2])[0]
        return FieldType.LIST, item
    for prefix, name in (
        ("timestamp", "DATETIME"), ("character varying", "STRING"),
        ("varchar", "STRING"), ("character", "STRING"), ("char", "STRING"),
        ("numeric", "DOUBLE"), ("decimal", "DOUBLE"),
    ):
        if t.startswith(prefix):
            return FieldType[name], None
    name = _SQL_FIELD_TYPES.get(t)
    return (FieldType[name] if name else None), None


def infer_manifest_from_information_schema(
    columns: DataFrame,
    table_constraints: DataFrame,
    key_column_usage: DataFrame,
    referential_constraints: DataFrame,
):
    """Relational manifest inference from ANSI catalog introspection — the
    reference's postgres path (db/postgres/schema_inference.py:24-110 over
    conn.introspect_schema(), which reads information_schema.tables /
    table_constraints / key_column_usage), re-expressed over the four
    standard catalog frames so the metadata layer is injectable: in
    production each frame is one :func:`graflo_spark.io.read_jdbc` call
    against ``information_schema.*`` (no JDBC server exists in the test
    container, so tests inject in-memory frames with the same shapes).

    Frame shapes (standard information_schema columns):
      - columns(table_name, column_name, data_type, ordinal_position)
      - table_constraints(table_name, constraint_name, constraint_type)
      - key_column_usage(constraint_name, table_name, column_name,
        ordinal_position)
      - referential_constraints(constraint_name, unique_constraint_name)

    Unlike :func:`infer_manifest_from_tables` (which PROVES keys from data),
    the catalog is authoritative: PKs become identities, FKs become edges,
    and a table whose >= 2 FKs cover its PK (the classic junction shape)
    becomes pairwise edges instead of a vertex. Catalog frames are tiny
    (thousands of rows at most), so a driver-side collect is the right
    plan — no distributed join is warranted here.
    """
    cols = sorted(
        columns.select("table_name", "column_name", "data_type",
                       "ordinal_position").collect(),
        key=lambda r: (r["table_name"], r["ordinal_position"]),
    )
    cons = table_constraints.select(
        "table_name", "constraint_name", "constraint_type").collect()
    kcu = sorted(
        key_column_usage.select("constraint_name", "table_name", "column_name",
                                "ordinal_position").collect(),
        key=lambda r: (r["constraint_name"], r["ordinal_position"]),
    )
    # MySQL (and others) extend the ANSI shape with referenced_table_name;
    # carry it when present — it is the only way to disambiguate the parent
    # side when every PK shares one name ('PRIMARY' on MySQL)
    _ref_cols = ["constraint_name", "unique_constraint_name"]
    has_ref_table = "referenced_table_name" in referential_constraints.columns
    if has_ref_table:
        _ref_cols.append("referenced_table_name")
    refs = referential_constraints.select(*_ref_cols).collect()

    table_fields: dict[str, list[Field]] = {}
    for r in cols:
        t, item = _sql_to_field_type(r["data_type"])
        table_fields.setdefault(r["table_name"], []).append(
            Field(r["column_name"], t, item))

    # constraints key by (table, name): constraint names COLLIDE across
    # tables (MySQL names every PK 'PRIMARY'; Postgres permits duplicates
    # per schema) — a bare-name key concatenates every table's PK columns
    # into one entry (review finding)
    kcu_by_con: dict[tuple[str, str], list] = {}
    for r in kcu:
        kcu_by_con.setdefault(
            (r["table_name"], r["constraint_name"]), []).append(r)
    con_type = {(r["table_name"], r["constraint_name"]):
                r["constraint_type"] for r in cons}
    # constraint name -> declaring tables, bucketed by ROLE: the child
    # side of a referential_constraints row can only be a FOREIGN KEY,
    # the parent side only a PRIMARY KEY/UNIQUE. Role-blind resolution
    # made MySQL — the very system whose 'PRIMARY' naming motivated the
    # (table, name) keying — drop EVERY proven FK the moment two tables
    # had PKs, because 'PRIMARY' matched both and resolved to []
    con_tables_child: dict[str, list[str]] = {}
    con_tables_parent: dict[str, list[str]] = {}
    for r in cons:
        if r["constraint_type"] == "FOREIGN KEY":
            con_tables_child.setdefault(
                r["constraint_name"], []).append(r["table_name"])
        elif r["constraint_type"] in ("PRIMARY KEY", "UNIQUE"):
            con_tables_parent.setdefault(
                r["constraint_name"], []).append(r["table_name"])

    identities: dict[str, list[str]] = {name: [] for name in table_fields}
    for (tbl, con), rows in kcu_by_con.items():
        if con_type.get((tbl, con)) == "PRIMARY KEY":
            identities[tbl] = [r["column_name"] for r in rows]

    def _rows_for(con_name: str, role_tables: dict[str, list[str]],
                  table_hint: str | None = None) -> list:
        # referential_constraints carries only the NAME; resolve it to
        # the table that declares a constraint so named IN THAT ROLE.
        # A still-ambiguous name (MySQL 'PRIMARY' across tables) needs
        # the row's referenced_table_name hint to disambiguate.
        matches = role_tables.get(con_name, [])
        if table_hint is not None and table_hint in matches:
            matches = [table_hint]
        if len(matches) != 1:
            return []  # ambiguous cross-table name: skip rather than mispair
        return kcu_by_con.get((matches[0], con_name), [])

    proven: dict[str, list[FkCandidate]] = {name: [] for name in table_fields}
    for r in refs:
        fk_con, uniq_con = r["constraint_name"], r["unique_constraint_name"]
        hint = r["referenced_table_name"] if has_ref_table else None
        child_rows = _rows_for(fk_con, con_tables_child)
        parent_rows = _rows_for(uniq_con, con_tables_parent, table_hint=hint)
        if not child_rows or len(child_rows) != len(parent_rows):
            continue
        for c_row, p_row in zip(child_rows, parent_rows):
            proven[c_row["table_name"]].append(FkCandidate(
                c_row["table_name"], c_row["column_name"],
                p_row["table_name"], p_row["column_name"]))

    junctions = set()
    for name in table_fields:
        fk_cols = {c.child_column for c in proven[name]}
        pk = set(identities[name])
        if len(fk_cols) >= 2 and (not pk or pk <= fk_cols):
            junctions.add(name)

    return _assemble_manifest(table_fields, identities, proven, junctions)


# --- OWL / RDFS ontology -> schema inference (SURVEY §1.3 family 2) --------

_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
_RDFS_NS = "http://www.w3.org/2000/01/rdf-schema#"
_OWL_NS = "http://www.w3.org/2002/07/owl#"


def _local(col: F.Column) -> F.Column:
    """URI local name: fragment after '#', else last path segment
    (reference hq/rdf_inferencer.py:_local_name)."""
    return F.element_at(F.split(col, "[#/]"), -1)


def infer_schema_from_ontology(
    triples: DataFrame,
    subject: str = "subject",
    predicate: str = "predicate",
    obj: str = "object",
) -> tuple[CoreSchema, list[ResourceConfig]]:
    """Infer a graph schema + per-class resource pipelines from an OWL/RDFS
    TBox, given as a triples DataFrame.

    Mapping (reference hq/rdf_inferencer.py:98-260):
        - ``owl:Class`` / ``rdfs:Class``           -> Vertex (identity ``_uri``)
        - ``owl:DatatypeProperty`` + ``rdfs:domain`` -> Field on domain vertex
        - ``owl:ObjectProperty`` + domain x range    -> Edge(domain, range, prop)
        - one ResourceConfig per class: extract the class vertex, then for
          every outgoing object property extract the range vertex from the
          predicate column (``mapping={_uri: relation}``) and emit the edge —
          including self-edges (domain == range).

    Spark shape: the TBox is filtered/joined distributively (three predicate
    filters + two equi-joins on the property subject), then the small result
    (class/property inventories are KBs even for huge ontologies) is
    collected to the driver to build the manifest. The ABox — the 100 TB
    side — never flows through here.
    """
    t = triples.select(
        F.col(subject).alias("s"), F.col(predicate).alias("p"), F.col(obj).alias("o")
    )
    classes_df = (
        t.filter(
            (F.col("p") == _RDF_TYPE)
            & F.col("o").isin(_OWL_NS + "Class", _RDFS_NS + "Class")
        )
        .filter(~F.col("s").startswith(_OWL_NS) & ~F.col("s").startswith(_RDFS_NS))
        .select(_local(F.col("s")).alias("cls"))
        .distinct()
    )
    props = t.filter(F.col("p") == _RDF_TYPE).select("s", F.col("o").alias("kind"))
    domains = t.filter(F.col("p") == _RDFS_NS + "domain").select(
        "s", _local(F.col("o")).alias("domain")
    )
    ranges = t.filter(F.col("p") == _RDFS_NS + "range").select(
        "s", _local(F.col("o")).alias("range")
    )
    dprops = (
        props.filter(F.col("kind") == _OWL_NS + "DatatypeProperty")
        .join(domains, "s")
        .select(_local(F.col("s")).alias("prop"), "domain")
        .distinct()
    )
    oprops = (
        props.filter(F.col("kind") == _OWL_NS + "ObjectProperty")
        .join(domains, "s")
        .join(ranges, "s")  # cartesian of declared domains x ranges per property
        .select(_local(F.col("s")).alias("prop"), "domain", "range")
        .distinct()
    )

    class_names = sorted(r["cls"] for r in classes_df.collect())
    class_set = set(class_names)
    fields_by_class: dict[str, list[str]] = {c: ["_key", "_uri"] for c in class_names}
    for r in sorted(dprops.collect(), key=lambda r: (r["domain"], r["prop"])):
        if r["domain"] in fields_by_class:
            fields_by_class[r["domain"]].append(r["prop"])
    edge_defs = sorted(
        (
            (r["domain"], r["range"], r["prop"])
            for r in oprops.collect()
            if r["domain"] in class_set and r["range"] in class_set
        ),
    )

    schema = CoreSchema(
        vertices=[
            Vertex(c, [Field(f) for f in fields], identity=["_uri"])
            for c, fields in fields_by_class.items()
        ],
        edges=[Edge(s, tgt, relation=rel) for s, tgt, rel in edge_defs],
    )
    resources = []
    for c in class_names:
        steps: list = [VertexStep(name=c)]
        for s, tgt, rel in edge_defs:
            if s != c:
                continue
            # range vertex referenced by URI in the predicate column; role
            # disambiguates self-edges (domain == range, e.g. `cites`)
            steps.append(
                VertexStep(
                    name=tgt,
                    mapping={"_uri": rel},
                    extraction_scope="mapped_only",
                    role=rel,
                )
            )
            steps.append(
                EdgeStep(
                    links=[
                        EdgeLink(
                            source=c, target=tgt, relation=rel, target_role=rel
                        )
                    ]
                )
            )
        resources.append(ResourceConfig(name=c, steps=steps, infer_edges=False))
    return schema, resources
