#!/usr/bin/env python3
"""compare.py with a HARD per-query oracle timeout, for the sf1 full-corpus
sweep: a few brute-force oracles (shingle self-joins over ~50k docs with ten
exact clones of every document) are quadratic in DuckDB at sf1; rather than
hang the sweep, each oracle runs in a killable subprocess and over-budget
ones are recorded as 'oracle_timeout' explicitly — a skipped oracle is
reported, never silently passed. Usage:
  compare_timeout.py <verify_out_dir> <sf_dir> [timeout_s]
"""
import sys, os, json, math, glob, queue, shutil
import multiprocessing as mp
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


def connect(sf_dir):
    con = duckdb.connect()
    # bounded per child: N workers × unbounded-thread DuckDBs thrash the box
    # and make even trivial oracles blow the wall-clock cap
    con.execute("PRAGMA threads=4")
    con.execute("PRAGMA memory_limit='10GB'")
    # concurrent children must not share a spill dir — colliding
    # duckdb_temp_storage files corrupt each other's reads
    tmp = f"/tmp/duckdb_spill_{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"PRAGMA temp_directory='{tmp}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Sf1Smoke fixtures are directories of parts
            p = os.path.join(p, "*.parquet")
        if glob.glob(p) or os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def one(sf_dir, out_dir, name, sql, q):
    """Child process: compare one query, put the verdict on the queue."""
    try:
        con = connect(sf_dir)
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        sd = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchall()
        scols = [d[0] for d in con.description]
        od = con.execute(sql).fetchall()
        ocols = [d[0] for d in con.description]
        sc, sr = canon(scols, sd)
        oc, orr = canon(ocols, od)
        if [c.lower() for c in sc] != [c.lower() for c in oc]:
            q.put({"status": "SCHEMA", "spark": sc, "oracle": oc})
        elif len(sr) != len(orr):
            q.put({"status": "ROWS", "spark": len(sr), "oracle": len(orr)})
        elif sr != orr:
            oset = set(orr)
            sset = set(sr)
            q.put({"status": "HASH",
                   "only_spark": [list(r) for r in sr if r not in oset][:3],
                   "only_oracle": [list(r) for r in orr if r not in sset][:3]})
        else:
            q.put({"status": "OK"})
    except Exception as e:
        q.put({"status": "ORACLE_ERROR", "err": str(e)[:300]})
    finally:
        shutil.rmtree(f"/tmp/duckdb_spill_{os.getpid()}", ignore_errors=True)


def main():
    import time
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    timeout_s = float(sys.argv[3]) if len(sys.argv) > 3 else 120.0
    workers = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    ok, rows_only, bad, timed_out = [], [], {}, []
    pending = []
    for name in sorted(d for d in os.listdir(out_dir)
                       if os.path.isdir(os.path.join(out_dir, d))):
        if not glob.glob(os.path.join(out_dir, name, "*.parquet")):
            bad[name] = {"status": "NO_SPARK_OUTPUT"}
        elif name not in oracle:
            rows_only.append(name)
        else:
            pending.append(name)
    running = {}  # name -> (Process, Queue, deadline)
    while pending or running:
        while pending and len(running) < workers:
            name = pending.pop(0)
            print(f"[cmp] start {name}", file=sys.stderr, flush=True)
            q = mp.Queue()
            p = mp.Process(target=one,
                           args=(sf_dir, out_dir, name, oracle[name], q))
            p.start()
            running[name] = (p, q, time.monotonic() + timeout_s)
        time.sleep(0.2)
        for name in list(running):
            p, q, deadline = running[name]
            if not p.is_alive():
                # q.empty() races the mp.Queue feeder-thread flush of a
                # just-exited child: a finished comparison could be
                # misreported as 'child died' — block briefly instead
                try:
                    verdict = q.get(timeout=5)
                except queue.Empty:
                    verdict = {"status": "ORACLE_ERROR", "err": "child died"}
                if verdict["status"] == "OK":
                    ok.append(name)
                else:
                    bad[name] = verdict
                print(f"[cmp] done  {name} {verdict['status']}",
                      file=sys.stderr, flush=True)
                del running[name]
            elif time.monotonic() > deadline:
                p.terminate()
                p.join(10)
                if p.is_alive():
                    p.kill()
                    p.join(5)
                # a killed child leaves its per-pid spill dir behind
                if p.pid is not None:
                    shutil.rmtree(f"/tmp/duckdb_spill_{p.pid}",
                                  ignore_errors=True)
                timed_out.append(name)
                print(f"[cmp] TIMEOUT {name}", file=sys.stderr, flush=True)
                del running[name]
    print(json.dumps({"ok": len(ok), "rows_only": sorted(rows_only),
                      "oracle_timeout": sorted(timed_out), "bad": bad}))


if __name__ == "__main__":
    main()
