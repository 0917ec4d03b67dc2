#!/usr/bin/env python3
"""compare.py with a per-query oracle timeout, for the sf1 full-corpus sweep:
a few brute-force oracles (shingle self-joins over ~50k docs with ten exact
clones of every document) are quadratic in DuckDB at sf1; rather than hang
the sweep, record them as 'oracle_timeout' explicitly — a skipped oracle is
reported, never silently passed. Usage:
  compare_timeout.py <verify_out_dir> <sf_dir> [timeout_s]
"""
import sys, os, json, math, glob, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
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
    timeout_s = float(sys.argv[3]) if len(sys.argv) > 3 else 300.0
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Sf1Smoke fixtures are directories of parts
            p = os.path.join(p, "*.parquet")
        if glob.glob(p) or os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok, rows_only, bad, timed_out = [], [], {}, []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            bad[name] = {"status": "NO_SPARK_OUTPUT"}
            continue
        sd = con.execute(
            f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [d[0] for d in con.description]
        if name not in oracle:
            rows_only.append(name)
            continue
        timer = threading.Timer(timeout_s, con.interrupt)
        timer.start()
        try:
            od = con.execute(oracle[name]).fetchall()
            ocols = [d[0] for d in con.description]
        except Exception as e:
            if "INTERRUPT" in str(e).upper() or "interrupted" in str(e).lower():
                timed_out.append(name)
            else:
                bad[name] = {"status": "ORACLE_ERROR", "err": str(e)[:300]}
            continue
        finally:
            timer.cancel()
        sc, sr = canon(scols, sd)
        oc, orr = canon(ocols, od)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            bad[name] = {"status": "SCHEMA", "spark": sc, "oracle": oc}
        elif len(sr) != len(orr):
            bad[name] = {"status": "ROWS", "spark": len(sr), "oracle": len(orr)}
        elif sr != orr:
            d1 = [r for r in sr if r not in set(orr)][:3]
            d2 = [r for r in orr if r not in set(sr)][:3]
            bad[name] = {"status": "HASH", "only_spark": d1, "only_oracle": d2}
        else:
            ok.append(name)
    print(json.dumps({"ok": len(ok), "rows_only": rows_only,
                      "oracle_timeout": timed_out, "bad": bad}))


if __name__ == "__main__":
    main()
