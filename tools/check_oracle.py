"""Local Spark-vs-DuckDB oracle diff harness (mirrors the driver's
CORRECTNESS check: row-count + schema + order-insensitive value hash).

Usage: python tools/check_oracle.py [name ...]   (default: all)
Env: ORACLE_SF_DIR (default /root/testdata/sf0.01);
     ORACLE_RECORD=<path> writes the CORRECTNESS_local_*.json record.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.queries import (  # noqa: E402
    REGISTRY,
    _import_all,
)
from retrieval_augmented_generation__rag__chatbot_with_vector_database_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in sorted(cols):
            v = r[c]
            if isinstance(v, float):
                v = round(v, 6)
                if v == 0:
                    v = 0.0
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main(names):
    _import_all()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    spark = get_spark("oracle_check")
    failures = []
    record: dict[str, dict] = {}
    for name in names or REGISTRY:
        qd = REGISTRY[name]
        sdf = qd.fn(spark, SF_DIR)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sdf.columns
        if qd.oracle is None:
            print(f"{name}: rows-only ({len(srows)} rows) OK" if srows or True else "")
            record[name] = {"ok": True, "rows": len(srows), "mode": "rows-only"}
            continue
        ddf = con.execute(qd.oracle).fetch_arrow_table().to_pylist()
        dcols = (
            [d[0] for d in con.execute(qd.oracle).description]
        )
        ok = True
        if len(srows) != len(ddf):
            print(f"{name}: ROWCOUNT spark={len(srows)} duck={len(ddf)}")
            ok = False
        if sorted(scols) != sorted(dcols):
            print(f"{name}: SCHEMA spark={sorted(scols)} duck={sorted(dcols)}")
            ok = False
        if ok:
            cs = canon(srows, scols)
            cd = canon(ddf, dcols)
            if cs != cd:
                diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
                print(f"{name}: VALUES mismatch, first diffs: {diff}")
                ok = False
        print(f"{name}: {'OK' if ok else 'FAIL'} ({len(srows)} rows)")
        record[name] = {"ok": ok, "rows": len(srows), "mode": "oracle"}
        if not ok:
            failures.append(name)
    out_path = os.environ.get("ORACLE_RECORD")
    if out_path:
        import json

        import pyspark

        with open(out_path, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "pyspark": pyspark.__version__,
                    "all_green": not failures,
                    "n_queries": len(record),
                    "queries": record,
                },
                f,
                indent=1,
            )
        print(f"recorded {len(record)} queries -> {out_path}")
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main(sys.argv[1:])
