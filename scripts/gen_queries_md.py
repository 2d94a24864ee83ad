"""Regenerate QUERIES.md from the registry's doc strings.
Usage: python scripts/gen_queries_md.py"""
import sys
sys.path.insert(0, "/root/repo")
from cryptocoininsights_data_engineer_project_spark.queries import REGISTRY

HDR = '''# QUERIES — the registry catalog

Machine-generated from the registry's own doc strings (one entry per
`@_q` registration in `cryptocoininsights_data_engineer_project_spark/queries.py`).
Every query is a `(spark_fn, duckdb_oracle)` pair — "oracle" below
means the driver's DuckDB cross-engine check covers it end-to-end
(rows + schema + value hash); "rows-only" marks the two queries whose
semantics aren't SQL-expressible (covered by unit invariants instead).

Regenerate with `python scripts/gen_queries_md.py` after registry changes.
'''

with open("/root/repo/QUERIES.md", "w") as f:
    f.write(HDR)
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        tag = "oracle" if spec.oracle else "rows-only"
        doc = " ".join((spec.doc or "").split())
        f.write(f"\n### `{name}`  <sub>{tag}</sub>\n\n{doc}\n")
print("wrote QUERIES.md", len(REGISTRY))
