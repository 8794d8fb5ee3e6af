"""Local replica of the driver's correctness check: run every
queries() entry on Spark AND its oracle_sql() on DuckDB at a given SF,
compare row count + sorted-column value multiset.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from indonesian_id_ocr_service_spark.session import build_session  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(v):
    if v is None:
        return "\0"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, list):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def _hash_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_canon(r[i]) for i in idx) for r in rows
    )
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = build_session(master="local[8]", shuffle_partitions=8,
                          extra_conf={
                              "spark.ui.showConsoleProgress": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = [c.lower() for c in sdf.columns]
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {str(e)[:300]}")
            failures.append(name)
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"SKIP {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(sql)
            d_cols = [c[0].lower() for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            failures.append(name)
            continue
        ok_schema = sorted(s_cols) == sorted(d_cols)
        ok_count = len(s_rows) == len(d_rows)
        hs = _hash_rows(s_cols, s_rows)
        hd = _hash_rows(d_cols, d_rows)
        ok_hash = hs == hd
        status = "OK  " if (ok_schema and ok_count and ok_hash) else "FAIL"
        print(f"{status} {name}: rows={len(s_rows)}/{len(d_rows)} "
              f"schema={ok_schema} hash={ok_hash} "
              f"({time.time() - t0:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if not ok_hash and ok_count and ok_schema:
                idx_s = sorted(range(len(s_cols)),
                               key=lambda i: s_cols[i])
                idx_d = sorted(range(len(d_cols)),
                               key=lambda i: d_cols[i])
                ls = sorted("|".join(_canon(r[i]) for i in idx_s)
                            for r in s_rows)
                ld = sorted("|".join(_canon(r[i]) for i in idx_d)
                            for r in d_rows)
                shown = 0
                for a, b in zip(ls, ld):
                    if a != b and shown < 4:
                        print(f"   spark : {a[:220]}")
                        print(f"   duckdb: {b[:220]}")
                        shown += 1
    print(f"\n{len(failures)} failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
