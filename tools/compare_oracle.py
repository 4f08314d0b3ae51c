#!/usr/bin/env python3
"""DEV-ONLY local parity harness (mirrors the driver's correctness gate).

Not part of the graft library; uses driver-side python deps (duckdb/pyarrow)
to compare Verify.scala's parquet dumps against the DuckDB oracles in
oracle_sql.json, the same way the driver does: sort columns by name, sort
rows, hash values.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, hashlib
import duckdb


def frame_hash(rel):
    df = rel.df()
    cols = sorted(df.columns)
    df = df[cols]
    # Sort EXACTLY like the driver's gate: pandas sort_values over all
    # columns. Load-bearing: sort_values factorizes each column, which
    # raises TypeError on unhashable cells (numpy arrays) — the same crash
    # the driver produces on array output columns. The pre-r5 behavior
    # (stringify rows, then sort the strings) masked that divergence class:
    # embed_quantize passed locally in r4 while the driver's gate was red.
    df = df.sort_values(by=cols)
    rows = ["\x1f".join(_norm(v) for v in t) for t in df.itertuples(index=False)]
    h = hashlib.md5("\x1e".join(rows).encode()).hexdigest()
    return h, len(rows), cols


def _norm(v):
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # dtype-faithful: repr keeps full precision AND the trailing '.0',
        # so an int64 Spark column vs a HUGEINT->float64 oracle column
        # mismatches here exactly like it does in the driver's gate.
        return repr(float(v))
    # pandas timestamps etc
    return str(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        pq = f"{out_dir}/{name}"
        files = glob.glob(f"{pq}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got_h, got_n, got_c = frame_hash(con.sql(f"SELECT * FROM '{pq}/*.parquet'"))
            exp_h, exp_n, exp_c = frame_hash(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if got_c != exp_c:
            print(f"FAIL {name}: columns {got_c} != {exp_c}")
            n_fail += 1
        elif got_n != exp_n:
            print(f"FAIL {name}: rows {got_n} != {exp_n}")
            n_fail += 1
        elif got_h != exp_h:
            print(f"FAIL {name}: hash mismatch ({got_n} rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({got_n} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
