"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 next to its oracle_sql()
via DuckDB and compare row-count, column names, and an
order-insensitive value hash. Usage: python tools/check_contract.py
[sf_dir] [only_query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")


def value_hash(rows, cols):
    """Order-insensitive: sort columns by name, normalize values to
    strings, sort rows, sha256."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    norm = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, bool):
                vals.append(str(v).lower())
            elif isinstance(v, float):
                vals.append(f"{v:.6g}")
            else:
                vals.append(str(v))
        norm.append("\x1f".join(vals))
    norm.sort()
    return hashlib.sha256("\n".join(norm).encode()).hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from fuggetabouspark.session import get_spark

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        cols = df.columns
        rows = [tuple(r) for r in df.collect()]
        dt = time.time() - t0
        if name not in oracles:
            print(f"  {name:28s} rows-only  {len(rows):6d} rows  {dt:5.1f}s")
            continue
        orows = con.execute(oracles[name]).fetchall()
        ocols = [d[0] for d in con.description]
        ok_n = len(rows) == len(orows)
        ok_c = sorted(cols) == sorted(ocols)
        h1, h2 = value_hash(rows, cols), value_hash(orows, ocols)
        ok_h = h1 == h2
        status = "OK " if (ok_n and ok_c and ok_h) else "FAIL"
        print(
            f"  {name:28s} {status} rows {len(rows)}/{len(orows)} "
            f"cols={'=' if ok_c else f'{sorted(cols)} vs {sorted(ocols)}'} "
            f"hash={'=' if ok_h else f'{h1} vs {h2}'}  {dt:5.1f}s"
        )
        if status == "FAIL":
            failures.append(name)
            if not ok_h and ok_n and ok_c:
                srt = sorted(rows)[:3]
                osrt = sorted(orows)[:3]
                print(f"      spark: {srt}")
                print(f"      duck : {osrt}")
    print("entry() smoke:", end=" ")
    edf = entrymod.entry(spark)
    print(f"{edf.count()} rows, schema {edf.columns}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all parity checks passed")


if __name__ == "__main__":
    main()
