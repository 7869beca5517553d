"""Generate a 10x scale-up of /root/testdata/sf0.1 for the scaling sweep.

The driver ships sf{0.001,0.01,0.1} only; the 100 TB posture argument needs
at least one measured doubling (VERDICT r7 item 3), so this script builds a
deterministic "sf1.0" under ``.scaling/sf1.0`` (gitignored, ~170 MB) by
replicating sf0.1 ten times with key-domain offsets that PRESERVE join
semantics and per-key statistics:

- ``region``/``nation``: copied unchanged (TPC-H dims do not scale).
- ``customer``/``supplier``/``part``/``orders``/``lineitem``/``events``:
  replica ``rep`` offsets every key by ``rep * (max_key + 1)`` of its
  domain, and every foreign key by the SAME offset — each replica is a
  self-contained copy, so join fan-outs, group sizes per key, and skew
  profiles match sf1.0-from-the-generator shape (10x keys, same rows/key;
  time ranges stay fixed, so rows/day grow 10x — TPC-H's own scaling rule).
- ``documents``: doc_ids offset; for rep>0 every 3rd token gets a
  ``~r{rep}`` suffix. Any 5-token shingle window then contains >=1 mutated
  token, so NO cross-replica near-duplicates exist (minhash/winnowing/
  containment outputs scale linearly like a real 10x corpus), while 2/3 of
  the token stream stays shared across replicas (common-term posting lists
  and groupBy(token) fan-in genuinely grow ~10x — the skew path is
  exercised, not dodged). Within-replica duplicate structure is intact.
- ``embeddings``: vec_ids offset; rep>0 vectors are mixed with a seeded
  Gaussian (v' = 0.75 v + 0.7 |v| g/|g|, RandomState(rep)) giving
  cos(v', v) ~ 0.73 (max over the corpus ~0.87) — below every near-dup threshold in the suite, so the
  LSH band joins see 10x genuinely-distinct vectors. Labels are kept:
  the 10-label structure still exists for centroid queries, while
  kmeans-based cells are the scaling knob under test.

Run:  python scripts/gen_scale_data.py  [--factor 10] [--out .scaling/sf1.0]
Idempotent: skips tables whose parquet already exists.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SRC = Path("/root/testdata/sf0.1")
REPO = Path(__file__).resolve().parents[1]

# (table, [key cols], [(fk col, key domain table, key domain col)])
OFFSET_SPECS = {
    "customer": (["c_custkey"], []),
    "supplier": (["s_suppkey"], []),
    "part": (["p_partkey"], []),
    "orders": (["o_orderkey"], [("o_custkey", "customer", "c_custkey")]),
    "lineitem": (
        [],
        [
            ("l_orderkey", "orders", "o_orderkey"),
            ("l_partkey", "part", "p_partkey"),
            ("l_suppkey", "supplier", "s_suppkey"),
        ],
    ),
    "events": (["event_id"], [("user_id", "events", "user_id")]),
}


def mutate_text(text: str, rep: int) -> str:
    toks = text.split(" ")
    return " ".join(
        f"{t}~r{rep}" if i % 3 == 2 else t for i, t in enumerate(toks)
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--out", default=str(REPO / ".scaling" / "sf1.0"))
    ap.add_argument(
        "--tables",
        default=None,
        help="comma list to build only these tables (e.g. the 100x "
        "spot-check needs just documents,embeddings)",
    )
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    f = args.factor
    wanted = set(args.tables.split(",")) if args.tables else None

    def want(t: str) -> bool:
        return wanted is None or t in wanted

    for t in ("region", "nation"):
        dst = out / f"{t}.parquet"
        if want(t) and not dst.exists():
            con.execute(
                f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}' (FORMAT PARQUET)"
            )
            print(f"{t}: copied")

    # key-domain sizes (max+1 per domain, shared by key and fk offsets)
    dom = {}
    for t, (keys, fks) in OFFSET_SPECS.items():
        for col in keys + [fk[0] for fk in fks]:
            src_t, src_c = t, col
            for fk_col, d_t, d_c in fks:
                if fk_col == col:
                    src_t, src_c = d_t, d_c
            dom[(src_t, src_c)] = (
                con.execute(
                    f"SELECT MAX({src_c}) + 1 FROM '{SRC}/{src_t}.parquet'"
                ).fetchone()[0]
            )

    for t, (keys, fks) in OFFSET_SPECS.items():
        dst = out / f"{t}.parquet"
        if not want(t) or dst.exists():
            continue
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        off = {}
        for c in keys:
            off[c] = dom[(t, c)]
        for fk_col, d_t, d_c in fks:
            off[fk_col] = dom[(d_t, d_c)]
        sel = ", ".join(
            f"({c} + rep * {off[c]}) AS {c}" if c in off else c for c in cols
        )
        con.execute(
            f"""COPY (
                SELECT {sel}
                FROM '{SRC}/{t}.parquet', range({f}) AS r(rep)
            ) TO '{dst}' (FORMAT PARQUET)"""
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]
        print(f"{t}: {n} rows")

    dst = out / "documents.parquet"
    if want("documents") and not dst.exists():
        docs = con.execute(f"SELECT * FROM '{SRC}/documents.parquet'").df()
        n_docs = int(docs["doc_id"].max()) + 1
        reps = []
        for rep in range(f):
            d = docs.copy()
            d["doc_id"] = d["doc_id"] + rep * n_docs
            if rep > 0:
                d["text"] = d["text"].map(lambda s, rep=rep: mutate_text(s, rep))
                d["n_chars"] = d["text"].str.len().astype("int64")
            reps.append(d)
        alld = pd.concat(reps, ignore_index=True)
        pq.write_table(pa.Table.from_pandas(alld, preserve_index=False), dst)
        print(f"documents: {len(alld)} rows")

    dst = out / "embeddings.parquet"
    if want("embeddings") and not dst.exists():
        emb = con.execute(f"SELECT * FROM '{SRC}/embeddings.parquet'").df()
        emb = emb.sort_values("vec_id").reset_index(drop=True)
        n_vecs = int(emb["vec_id"].max()) + 1
        base = np.stack(emb["embedding"].to_numpy())  # (n, 64) float32
        reps = []
        for rep in range(f):
            e = emb.copy()
            e["vec_id"] = e["vec_id"] + rep * n_vecs
            if rep > 0:
                rng = np.random.RandomState(rep)
                g = rng.standard_normal(base.shape)
                g = g / np.linalg.norm(g, axis=1, keepdims=True)
                v = 0.75 * base + 0.7 * np.linalg.norm(
                    base, axis=1, keepdims=True
                ) * g
                e["embedding"] = [row.astype(np.float32) for row in v]
            reps.append(e)
        alle = pd.concat(reps, ignore_index=True)
        schema = pa.schema(
            [
                ("vec_id", pa.int64()),
                ("embedding", pa.list_(pa.float32())),
                ("label", pa.int32()),
            ]
        )
        pq.write_table(
            pa.Table.from_pandas(alle, preserve_index=False, schema=schema), dst
        )
        print(f"embeddings: {len(alle)} rows")

    print("done ->", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
