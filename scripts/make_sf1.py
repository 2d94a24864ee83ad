"""Derive an sf1-scale dataset (10x sf0.1) for the local parity sweep.

The driver ships sf{0.001,0.01,0.1} only (TESTDATA.md); scale-
sensitive correctness classes — LSH banding, discrete percentiles,
float-accumulation aggregates, window frames — are exactly the ones a
further 10x can still shift, so VERDICT r4 #7 asks for an sf1 sweep.
The driver's generator isn't available, so this derives sf1 FROM
sf0.1: the oracle-parity property under test is Spark-vs-DuckDB
agreement on identical inputs, which needs sf1 VOLUME and plausible
distributions, not the driver's exact byte stream.

Construction (deterministic, seed-pinned):
- TPC-H tables: 10 copies, every key offset by copy x (max_key + 1)
  so cardinalities scale 10x with referential integrity intact
  (lineitem follows orders' and part/supplier's offsets); monetary
  values perturbed +copy/100 (new distinct cents -> richer discrete-
  percentile boundaries instead of a 10x-degenerate multiset).
- events: 10 copies, user_id/event_id offset (10x key groups, same
  per-key series depth -> window frames at scale), value perturbed
  +copy/10000.
- documents: 50k docs from the Zipf fixture generator (realistic
  vocabulary; replicating the driver's ~20-word corpus 10x would make
  every copy a near-dup of its source and blow up every dedup oracle
  quadratically).
- embeddings: 10 noise-perturbed replicas per vector (sigma chosen so
  cross-copy cosine lands ~0.8, below the dedup thresholds — near-dup
  density stays realistic instead of planting 45-pair cliques).

Usage: python scripts/make_sf1.py [out_dir]   (default /root/repo/.sf1)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

SRC = "/root/testdata/sf0.1"
COPIES = 10


def tpch_tables(con: duckdb.DuckDBPyConnection, out: str) -> None:
    con.execute(f"CREATE OR REPLACE VIEW copies AS SELECT unnest(generate_series(0, {COPIES - 1})) AS c")
    for t in ("region", "nation"):  # fixed dimensions: unchanged
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    maxes = {}
    for t, k in (
        ("customer", "c_custkey"),
        ("supplier", "s_suppkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
        ("events", "user_id"),
    ):
        maxes[k] = con.execute(
            f"SELECT max({k}) + 1 FROM read_parquet('{SRC}/{t}.parquet')"
        ).fetchone()[0]
    ko, kc, kp, ks, ku = (
        maxes["o_orderkey"],
        maxes["c_custkey"],
        maxes["p_partkey"],
        maxes["s_suppkey"],
        maxes["user_id"],
    )
    jobs = {
        "customer": f"""
            SELECT c_custkey + c * {kc} AS c_custkey,
                   c_name || '_' || c AS c_name, c_nationkey,
                   round(c_acctbal + c * 0.01, 2) AS c_acctbal, c_mktsegment
            FROM read_parquet('{SRC}/customer.parquet'), copies""",
        "supplier": f"""
            SELECT s_suppkey + c * {ks} AS s_suppkey,
                   s_name || '_' || c AS s_name, s_nationkey,
                   round(s_acctbal + c * 0.01, 2) AS s_acctbal
            FROM read_parquet('{SRC}/supplier.parquet'), copies""",
        "part": f"""
            SELECT p_partkey + c * {kp} AS p_partkey,
                   p_name || '_' || c AS p_name, p_brand, p_type, p_size,
                   round(p_retailprice + c * 0.01, 2) AS p_retailprice
            FROM read_parquet('{SRC}/part.parquet'), copies""",
        "orders": f"""
            SELECT o_orderkey + c * {ko} AS o_orderkey,
                   o_custkey + c * {kc} AS o_custkey, o_orderstatus,
                   round(o_totalprice + c * 0.01, 2) AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM read_parquet('{SRC}/orders.parquet'), copies""",
        "lineitem": f"""
            SELECT l_orderkey + c * {ko} AS l_orderkey,
                   l_partkey + c * {kp} AS l_partkey,
                   l_suppkey + c * {ks} AS l_suppkey,
                   l_linenumber, l_quantity,
                   round(l_extendedprice + c * 0.01, 2) AS l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM read_parquet('{SRC}/lineitem.parquet'), copies""",
        "events": f"""
            SELECT event_id + c * 10000000 AS event_id, ts,
                   user_id + c * {ku} AS user_id, event_type,
                   CASE WHEN value IS NULL THEN NULL
                        ELSE round(value + c * 0.0001, 6) END AS value,
                   props
            FROM read_parquet('{SRC}/events.parquet'), copies""",
    }
    for t, sql in jobs.items():
        con.execute(f"COPY ({sql}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


def documents(out: str, n_docs: int = 50_000) -> None:
    sys.path.insert(0, "/root/repo")
    from cryptocoininsights_data_engineer_project_spark.pipeline.fixtures import (
        zipf_documents,
    )

    rows, _ = zipf_documents(n_docs=n_docs, dup_frac=0.02, seed=77)
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{out}/documents.parquet", index=False)
    print(f"documents: {len(rows)} rows")


def embeddings(out: str) -> None:
    src = pd.read_parquet(f"{SRC}/embeddings.parquet")
    base = np.stack(src["embedding"].to_numpy()).astype(np.float64)
    n, dim = base.shape
    rng = np.random.default_rng(99)
    frames = []
    for c in range(COPIES):
        if c == 0:
            m = base
        else:
            noise = rng.normal(0.0, 1.0, size=base.shape)
            nrm = np.linalg.norm(base, axis=1, keepdims=True)
            # sigma ~0.75 of the vector norm -> cross-copy cosine ~0.8,
            # under the dedup thresholds: replicas are NOT near-dups
            m = base + noise * (0.75 * nrm / np.sqrt(dim))
        frames.append(
            pd.DataFrame(
                {
                    "vec_id": src["vec_id"].to_numpy() + c * n,
                    "embedding": list(m.astype(np.float32)),
                    "label": src["label"].to_numpy(),
                }
            )
        )
    allf = pd.concat(frames, ignore_index=True)
    allf.to_parquet(f"{out}/embeddings.parquet", index=False)
    print(f"embeddings: {len(allf)} rows")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tpch_tables(con, out)
    documents(out)
    embeddings(out)
    print(f"sf1 dataset at {out}")


if __name__ == "__main__":
    main()
