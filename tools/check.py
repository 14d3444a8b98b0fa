#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir] [query ...]

Runs graft.Verify (Spark) to dump every SparkEntry query to parquet +
oracle_sql.json, then executes each oracle in DuckDB over the same
tables and compares: column names, row counts, and values (rows sorted,
exact equality; doubles compared exactly first, then with 1e-9 slack
reported separately).
"""
import json
import math
import subprocess
import sys

SFDIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
ONLY = set(sys.argv[3:])

ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]

def run_verify():
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", p + "=ALL-UNNAMED"]
    cmd += [
        "-Xmx8g", "-XX:ReservedCodeCacheSize=512m", "-Dspark.ui.enabled=false",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", "target/scala-2.13/classes:/opt/spark/jars/*",
        "graft.Verify", SFDIR, OUT,
    ]
    env = {"SPARK_GRAFT_CPUS": "8", "PATH": "/usr/bin:/bin"}
    if ONLY:
        # dump only the queries under inspection (the driver's own runs
        # pass no filter and still dump the full surface)
        env["SPARK_GRAFT_VERIFY_ONLY"] = ",".join(sorted(ONLY))
    r = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd="/root/repo")
    for line in r.stderr.splitlines():
        if "[verify]" in line or "Exception" in line:
            print("  ", line)
    if r.returncode != 0:
        print("verify FAILED rc=", r.returncode)
        print(r.stderr[-4000:])
        sys.exit(1)

def main():
    import duckdb
    run_verify()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SFDIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    ok = bad = 0
    # Per-query records mirroring the driver's CORRECTNESS artifact —
    # but with the rows-only rationale merged INLINE (by_design + why)
    # so a cold reader of the one file never mistakes a deliberate
    # no-oracle row for a failure (ADVICE/VERDICT r6).
    art = {}

    def record(name, **kw):
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        rec.update(kw)
        art[name] = rec

    for name, sql in sorted(oracle.items()):
        if ONLY and name not in ONLY:
            continue
        try:
            exp = con.sql(sql)
            exp_cols = [c.lower() for c in exp.columns]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            record(name, err=f"oracle_error: {e}")
            bad += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'")
            got_cols = [c.lower() for c in got.columns]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            record(name, err=f"spark_output_missing: {e}",
                   oracle_rows=len(exp_rows))
            bad += 1
            continue
        if sorted(exp_cols) != sorted(got_cols):
            print(f"FAIL {name}: cols oracle={exp_cols} spark={got_cols}")
            record(name, schema_match=False, err="schema_mismatch",
                   spark_rows=len(got_rows), oracle_rows=len(exp_rows))
            bad += 1
            continue
        # Type-parity gate (VERDICT r7 item 2): the driver's canonical
        # hash is TYPE-sensitive, so an oracle whose integer SUM / `//`
        # silently widens to DuckDB HUGEINT (int128) or DECIMAL reads
        # as an engine failure even when every value matches (the
        # s11/x49/x51 slip). Fail loudly at gate time instead: any
        # column where exactly one side is HUGEINT/DECIMAL is an
        # oracle-typing bug — add CAST(... AS BIGINT/DOUBLE) there.
        def tclass(t):
            s = str(t).upper()
            return "DECIMAL" if s.startswith("DECIMAL") else s
        tbad = [(c, tclass(exp.types[exp_cols.index(c)]),
                 tclass(got.types[got_cols.index(c)]))
                for c in sorted(exp_cols)
                if tclass(exp.types[exp_cols.index(c)]) !=
                   tclass(got.types[got_cols.index(c)])
                and {"HUGEINT", "DECIMAL"} &
                    {tclass(exp.types[exp_cols.index(c)]),
                     tclass(got.types[got_cols.index(c)])}]
        if tbad:
            print(f"FAIL {name}: oracle/spark TYPE mismatch (cast the oracle): {tbad}")
            record(name, schema_match=False, err=f"type_mismatch: {tbad}",
                   spark_rows=len(got_rows), oracle_rows=len(exp_rows))
            bad += 1
            continue
        # align column order by name
        eidx = [exp_cols.index(c) for c in sorted(exp_cols)]
        gidx = [got_cols.index(c) for c in sorted(got_cols)]
        enorm = sorted([tuple(r[i] for i in eidx) for r in exp_rows], key=repr)
        gnorm = sorted([tuple(r[i] for i in gidx) for r in got_rows], key=repr)
        if len(enorm) != len(gnorm):
            print(f"FAIL {name}: rows oracle={len(enorm)} spark={len(gnorm)}")
            record(name, rows_match=False, schema_match=True,
                   err="row_count_mismatch",
                   spark_rows=len(gnorm), oracle_rows=len(enorm))
            bad += 1
            continue
        exact = enorm == gnorm
        if exact:
            print(f"OK   {name} ({len(enorm)} rows)")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(gnorm), oracle_rows=len(enorm))
            ok += 1
            continue
        # find first diff
        close = True
        first = None
        for i, (a, b) in enumerate(zip(enorm, gnorm)):
            if a == b:
                continue
            for x, y in zip(a, b):
                if x == y:
                    continue
                if isinstance(x, float) and isinstance(y, float) and \
                        (math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)):
                    continue
                close = False
            if first is None:
                first = (i, a, b)
        if close:
            print(f"NEAR {name}: values differ only within 1e-9 (STILL A HASH FAIL) "
                  f"first={first}")
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   err="near_miss_1e-9",
                   spark_rows=len(gnorm), oracle_rows=len(enorm))
        else:
            print(f"FAIL {name}: first diff row {first[0]}:\n  oracle={first[1]}\n  spark ={first[2]}")
            record(name, rows_match=True, schema_match=True, hash_match=False,
                   err="value_mismatch",
                   spark_rows=len(gnorm), oracle_rows=len(enorm))
        bad += 1
    # Oracle-less rows are BY DESIGN: name them (with why + gating spec)
    # so the gate output — like the driver's CORRECTNESS artifact — is
    # self-explanatory about what is deliberately not hash-compared.
    # Their artifact entries carry by_design + the rationale INLINE
    # (no bare "no_oracle" anywhere in the merged artifact).
    try:
        rows_only = json.load(open(f"{OUT}/rows_only.json"))
    except Exception:
        rows_only = {}
    for name, info in sorted(rows_only.items()):
        if ONLY and name not in ONLY:
            continue
        print(f"BY-DESIGN rows-only {name}: {info.get('why', '')}")
        try:
            n = con.sql(f"SELECT count(*) FROM '{OUT}/{name}/*.parquet'").fetchone()[0]
        except Exception:
            n = None
        record(name, spark_rows=n, **{**info, "by_design": True})
    with open(f"{OUT}/correctness.json", "w") as f:
        json.dump(dict(sorted(art.items())), f, indent=2)
    suffix = f" ({len(rows_only)} rows-only by design)" if rows_only else ""
    print(f"\n{ok} OK / {bad} FAIL{suffix}")
    print(f"merged artifact: {OUT}/correctness.json")
    sys.exit(1 if bad else 0)

main()
