"""Measurement-only scale-up generator: synthesize a larger SF directory
(default sf1.0-equivalent, 10x sf0.1) with the same schemas and
distributions as the driver's testdata, for LOCAL perf runs + DuckDB
oracle-equivalence checks at scale.

NOT driver data: the driver generates its own large SF at measurement time.
This replica exists because optimizations must hold beyond 600k-row tables
(brief: "optimizations must hold at both sizes") and the sandbox only ships
sf{0.001,0.01,0.1}. Correctness against the oracle is still meaningful on
this data — tools/check_queries.py recomputes DuckDB truth on whatever
$SPARK_GRAFT_SF_DIR holds.

Construction:
  * region/nation: copied verbatim.
  * customer/orders/lineitem/part/supplier/events: K=10 key-offset replicas
    of sf0.1 (offsets per table keep PK uniqueness and FK joins
    within-replica, so join fan-outs match the 10x driver scaling);
    c_name re-derived from the new key; timestamps perturbed +k
    microseconds per replica so sort ties stay unique.
  * documents: fresh random texts from the observed 31-word vocabulary,
    uniform 10..99 words (matches observed length distribution) — fresh,
    not replicated, so LSH cluster sizes scale like the driver's generator
    instead of multiplying by K.
  * embeddings: fresh i.i.d. unit vectors (observed structure: gaussian,
    float32-normalized to unit norm, labels uniform 0..9).

Usage: python tools/make_sf_big.py [--out /root/testdata_local/sf1.0] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os

import duckdb
import numpy as np

SRC = "/root/testdata/sf0.1"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/testdata_local/sf1.0")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--seed", type=int, default=4242)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    K = args.k

    def copy(t):
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
                    f"'{args.out}/{t}.parquet' (FORMAT PARQUET)")

    copy("region")
    copy("nation")

    def replicate(t, sql_per_k):
        parts = " UNION ALL ".join(sql_per_k(k) for k in range(K))
        con.execute(f"COPY ({parts}) TO '{args.out}/{t}.parquet' "
                    f"(FORMAT PARQUET)")

    n_cust, n_ord, n_part, n_supp, n_ev, n_user = (
        15000, 150000, 20000, 1000, 100000, 1500)

    replicate("customer", lambda k: f"""
      SELECT c_custkey + {k * n_cust} AS c_custkey,
             concat('Customer#', lpad(CAST(c_custkey + {k * n_cust} AS VARCHAR), 9, '0')) AS c_name,
             c_nationkey, c_acctbal, c_mktsegment
      FROM '{SRC}/customer.parquet'""")

    replicate("orders", lambda k: f"""
      SELECT o_orderkey + {k * n_ord} AS o_orderkey,
             o_custkey + {k * n_cust} AS o_custkey,
             o_orderstatus, o_totalprice,
             o_orderdate + INTERVAL ({k}) MICROSECOND AS o_orderdate,
             o_orderpriority
      FROM '{SRC}/orders.parquet'""")

    replicate("lineitem", lambda k: f"""
      SELECT l_orderkey + {k * n_ord} AS l_orderkey,
             l_partkey + {k * n_part} AS l_partkey,
             l_suppkey + {k * n_supp} AS l_suppkey,
             l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
             l_returnflag, l_linestatus,
             l_shipdate + INTERVAL ({k}) MICROSECOND AS l_shipdate
      FROM '{SRC}/lineitem.parquet'""")

    replicate("part", lambda k: f"""
      SELECT p_partkey + {k * n_part} AS p_partkey,
             p_name, p_brand, p_type, p_size, p_retailprice
      FROM '{SRC}/part.parquet'""")

    replicate("supplier", lambda k: f"""
      SELECT s_suppkey + {k * n_supp} AS s_suppkey,
             s_name, s_nationkey, s_acctbal
      FROM '{SRC}/supplier.parquet'""")

    replicate("events", lambda k: f"""
      SELECT event_id + {k * n_ev} AS event_id,
             ts + INTERVAL ({k}) MICROSECOND AS ts,
             user_id + {k * n_user} AS user_id,
             event_type, value, props
      FROM '{SRC}/events.parquet'""")

    # ---- documents: fresh texts, observed vocab + length distribution ----
    rng = np.random.RandomState(args.seed)
    vocab = sorted(r[0] for r in con.execute(
        f"SELECT DISTINCT unnest(string_split(text, ' ')) "
        f"FROM '{SRC}/documents.parquet'").fetchall())
    langs = [r[0] for r in con.execute(
        f"SELECT lang, count(*) FROM '{SRC}/documents.parquet' "
        f"GROUP BY lang ORDER BY lang").fetchall()]
    n_docs = 5000 * K
    lens = rng.randint(10, 100, size=n_docs)
    texts = [" ".join(rng.choice(vocab, size=n)) for n in lens]
    docs = {
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": [langs[i] for i in rng.randint(0, len(langs), n_docs)],
        "source": [f"src{i}" for i in rng.randint(0, 20, n_docs)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }
    import pyarrow as pa
    import pyarrow.parquet as pq
    pq.write_table(pa.table(docs), f"{args.out}/documents.parquet")

    # ---- embeddings: fresh i.i.d. unit vectors (float32-normalized) ----
    n_vec = 2000 * K
    V = rng.normal(0.0, 1.0, size=(n_vec, 64)).astype(np.float32)
    V /= np.linalg.norm(V, axis=1, keepdims=True).astype(np.float32)
    emb_tbl = pa.table({
        "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
        "embedding": pa.array(list(V), type=pa.list_(pa.float32())),
        "label": pa.array(rng.randint(0, 10, n_vec).astype(np.int32)),
    })
    pq.write_table(emb_tbl, f"{args.out}/embeddings.parquet")

    meta = {"src": SRC, "k": K, "seed": args.seed, "n_docs": n_docs,
            "n_vec": n_vec}
    with open(f"{args.out}/_LOCAL_REPLICA.json", "w") as f:
        json.dump(meta, f)
    print(json.dumps(meta))


if __name__ == "__main__":
    main()
