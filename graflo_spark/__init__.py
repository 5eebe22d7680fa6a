"""graflo_spark — a PySpark-native graph-ETL + query engine.

Re-implements the capabilities of growgraph/graflo (reference: /root/reference)
as an idiomatic Spark design: declarative manifests compile to lazy DataFrame
plans; Catalyst supplies optimization; vertex/edge tables are parquet/Delta
directories; queries are DataFrame programs.

Key entry points:
    - :class:`graflo_spark.manifest.CoreSchema` / :class:`GraphManifest`
    - :class:`graflo_spark.compiler.ResourceCompiler` — resource DF -> GraphBatch
    - :class:`graflo_spark.store.GraphStore` — parquet-backed graph tables
    - :class:`graflo_spark.engine.GraphEngine` — define/ingest/export/migrate
    - :mod:`graflo_spark.query` — Node/Neighbor/Traverse/Aggregate queries
    - :mod:`graflo_spark.infer` — identity/FK/table-kind inference
    - :mod:`graflo_spark.evolve` — manifest evolution ops + diff/plan/apply
    - :mod:`graflo_spark.errors` — doc-error budget + failure sink
    - :mod:`graflo_spark.ops` — LLM-pipeline operators (dedup, simsearch,
      textstats, decontam, pii, urls, sampling, packing, multimodal) and
      their composition :mod:`graflo_spark.ops.pipeline`
"""

__version__ = "0.1.0"

from graflo_spark.manifest import (  # noqa: F401
    CoreSchema,
    Edge,
    EdgeId,
    Field,
    FieldType,
    GraphManifest,
    Vertex,
)
from graflo_spark.filters import FilterExpression  # noqa: F401
