"""Local mimic of the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 on Spark AND the paired
oracle_sql() on DuckDB, compares row count, column names, and
order-insensitive values. Usage: python scripts/check_contract.py [names...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(names=None):
    import __spark_entry__ as e
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = e.queries()
    os_ = e.oracle_sql()
    names = names or list(qs)
    n_ok = 0
    for name in names:
        t0 = time.time()
        try:
            got = qs[name](spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in os_:
            print(f"SKIP {name}: no oracle (rows-only: {len(got)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            exp = con.execute(os_[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} vs {len(exp)}")
        if sorted(got.columns) != sorted(exp.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(exp.columns)}")
        if not problems:
            g = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
            x = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
            try:
                pd.testing.assert_frame_equal(g, x, check_dtype=False, check_exact=False, rtol=1e-9)
            except AssertionError as ex:
                problems.append(f"values differ: {str(ex)[:300]}")
        status = "OK  " if not problems else "FAIL"
        if not problems:
            n_ok += 1
        print(f"{status} {name} ({len(got)} rows, {time.time()-t0:.1f}s)" + ("" if not problems else f": {problems}"))
        if problems and len(got) < 30:
            print("  got:", got.to_dict("records")[:12])
            print("  exp:", exp.to_dict("records")[:12])
    print(f"\n{n_ok}/{len(names)} matched")


if __name__ == "__main__":
    main(sys.argv[1:] or None)
