#!/usr/bin/env python3
"""Dev-only self-check mirroring the driver's t2 gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
testdata parquet tables and compare values exactly.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os, re
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def check_coverage_inventory(oracle):
    """COVERAGE.md's generated inventory must list exactly the gated query
    keys — doc drift (a query added without a COVERAGE entry, or a stale
    count) fails the gate. Regenerate with scripts/gen_inventory.py."""
    cov_path = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    cov = open(cov_path).read()
    m = re.search(r"<!-- inventory:begin -->(.*?)<!-- inventory:end -->",
                  cov, re.S)
    if not m:
        print("[BAD ] COVERAGE.md: missing inventory markers"); return 1
    listed = set(re.findall(r"`([A-Za-z0-9_]+)`", m.group(1)))
    keys = set(oracle.keys())
    if listed != keys:
        extra = sorted(listed - keys); missing = sorted(keys - listed)
        print(f"[BAD ] COVERAGE.md inventory drift: "
              f"not-in-map={extra[:5]} not-in-doc={missing[:5]}")
        return 1
    print(f"[ OK ] COVERAGE.md inventory: {len(keys)} queries in sync")
    return 0

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    if only:  # dev loop: prefix filter, inventory check skipped
        pfx = only.split(",")
        oracle = {k: v for k, v in oracle.items()
                  if any(k.startswith(p) for p in pfx)}
    else:
        n_bad += check_coverage_inventory(oracle)
    for name, sql in sorted(oracle.items()):
        res_glob = f"{out_dir}/{name}/*.parquet"
        files = glob.glob(res_glob)
        if not files:
            print(f"[MISS] {name}: no spark output"); n_bad += 1; continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1; continue
        g = got.to_pylist(); w = want.to_pylist()
        # driver sorts columns by name before hashing values
        g = [tuple(r[k] for k in sorted(r)) for r in g]
        w = [tuple(r[k] for k in sorted(r)) for r in w]
        gc = sorted(got.column_names); wc = sorted(want.column_names)
        if gc != wc:
            print(f"[BAD ] {name}: columns {gc} != {wc}"); n_bad += 1; continue
        # The driver's hash is TYPE-CLASS-sensitive (pandas value hashing:
        # ints cast to uint64, so int32 vs int64 agree — j2_fuzzy_join's
        # BIGINT-vs-int32 levenshtein passes the driver — but int vs float
        # vs decimal diverge), while Python `==` is not even that
        # (Decimal(3) == 3). A DuckDB HUGEINT (uncast SUM) or DECIMAL
        # column vs Spark int64/double passes value-compare but fails the
        # driver — flag cross-engine arrow type-FAMILY drift; width drift
        # within a family is fine.
        fam = lambda t: ("int" if "int" in str(t) else
                         "float" if ("float" in str(t) or "double" in str(t)) else
                         "decimal" if "decimal" in str(t) else
                         "ts" if "timestamp" in str(t) else
                         "str" if "string" in str(t) else str(t))
        tdrift = [(c, got.schema.field(c).type, want.schema.field(c).type)
                  for c in gc
                  if fam(got.schema.field(c).type) != fam(want.schema.field(c).type)]
        if tdrift:
            c, a, b = tdrift[0]
            print(f"[BAD ] {name}: type drift on '{c}': spark={a} duck={b}"
                  f" (driver hash is type-sensitive)")
            n_bad += 1; continue
        if len(g) != len(w):
            print(f"[BAD ] {name}: rows {len(g)} != {len(w)}"); n_bad += 1; continue
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        if mism:
            i, a, b = mism[0]
            print(f"[BAD ] {name}: {len(mism)} mismatched rows; first @{i}:")
            print(f"        spark={a}")
            print(f"        duck ={b}")
            n_bad += 1
        else:
            print(f"[ OK ] {name}: {len(g)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
