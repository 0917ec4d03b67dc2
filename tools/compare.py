#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: for each query result dumped
by graft.Verify, run the oracle SQL in DuckDB over the same parquet tables and
compare rows/schema/values (columns sorted by name, rows sorted, values
normalized). Usage: compare.py <verify_out_dir> <sf_dir>"""
import sys, os, json, math, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # high precision: must expose last-cent drift in rounded sums while
        # tolerating only sub-ulp formatting noise
        return f"{v:.12g}"
    if isinstance(v, bool):
        return str(v).lower()
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("T", " ")
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        entry = {}
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            entry["status"] = "no_result"
            results[name] = entry
            continue
        rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
        scols, srows = rel.columns, rel.fetchall()
        entry["rows"] = len(srows)
        if name not in oracle:
            entry["status"] = "rows_only"
            entry["ok"] = len(srows) > 0
            results[name] = entry
            continue
        try:
            orel = con.sql(oracle[name])
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            entry["status"] = "oracle_error"
            entry["error"] = str(e)[:300]
            results[name] = entry
            continue
        sc, sr = canon(scols, srows)
        oc, od = canon(ocols, orows)
        entry["oracle_rows"] = len(od)
        entry["schema_match"] = [c.lower() for c in sc] == [c.lower() for c in oc]
        entry["rows_match"] = len(sr) == len(od)
        entry["hash_match"] = sr == od
        entry["status"] = "ok" if (entry["schema_match"] and entry["rows_match"]
                                   and entry["hash_match"]) else "MISMATCH"
        if entry["status"] == "MISMATCH":
            if not entry["schema_match"]:
                entry["spark_cols"], entry["oracle_cols"] = sc, oc
            else:
                diff = [(a, b) for a, b in zip(sr, od) if a != b][:3]
                only_s = [r for r in sr if r not in set(od)][:3]
                only_o = [r for r in od if r not in set(sr)][:3]
                entry["first_diffs"] = [{"spark": list(a), "oracle": list(b)}
                                        for a, b in diff]
                entry["only_spark"] = [list(r) for r in only_s]
                entry["only_oracle"] = [list(r) for r in only_o]
        results[name] = entry
    bad = {k: v for k, v in results.items() if v["status"] not in ("ok", "rows_only")}
    ok = [k for k, v in results.items() if v["status"] == "ok"]
    ro = [k for k, v in results.items() if v["status"] == "rows_only"]
    print(json.dumps({"ok": len(ok), "rows_only": ro,
                      "bad": bad}, indent=2, default=str))

if __name__ == "__main__":
    main()
