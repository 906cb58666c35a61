"""Sources & sinks: the code-repository ingest path (BASELINE.json:15) plus
generic readers/writers mirroring the reference's scan/sink inventory
(SURVEY.md §2.1).
"""

from graph_computing_go_spark.sources.ingest import (  # noqa: F401
    build_edge_table,
    extract_imports,
    resolve_imports,
    verify_content_sha256,
)
from graph_computing_go_spark.sources.repos import synthesize_repos  # noqa: F401
