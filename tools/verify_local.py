"""Local replica of the driver's correctness gate.

Runs every declared query on Spark and its oracle on DuckDB at sf0.01,
compares row count, column names, and exact values (order-insensitive),
and prints a per-query PASS/FAIL table with first-difference diagnostics.

Usage: python tools/verify_local.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01")

from dataengineeringutils_spark.blas import cap_blas_env  # noqa: E402

cap_blas_env(1, force=True)  # measurement entrypoint: override ambient (blas.py)

from dataengineeringutils_spark.registry import oracle_sql, queries  # noqa: E402
from dataengineeringutils_spark.session import get_spark  # noqa: E402
from dataengineeringutils_spark.tables import TABLES  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_cell(v):
    """Canonicalize a cell for exact cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.to_datetime64().astype("datetime64[us]").item()
    if isinstance(v, (list, np.ndarray)):
        return tuple(canon_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon_cell(x)) for k, x in v.items()))
    return v


def canon_frame(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(canon_cell(v) for v in row))
    out.sort(key=repr)
    return cols, out


def compare(
    name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame
) -> tuple[list[str], dict]:
    """Returns (issue strings, driver-schema flags): the flags mirror the
    per-row record of the driver's CORRECTNESS_r*.json exactly —
    {rows_match, schema_match, hash_match} — so SELFCHECK artifacts can
    be adopted wholesale."""
    issues = []
    rows_match = len(spark_pdf) == len(duck_pdf)
    if not rows_match:
        issues.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, s_rows = canon_frame(spark_pdf)
    d_cols, d_rows = canon_frame(duck_pdf)
    schema_match = s_cols == d_cols
    flags = {
        "rows_match": rows_match,
        "schema_match": schema_match,
        "hash_match": False,
    }
    if not schema_match:
        issues.append(f"columns: spark={s_cols} duck={d_cols}")
        return issues, flags
    if issues:
        return issues, flags
    n_bad = 0
    first = None
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            n_bad += 1
            if first is None:
                first = (i, a, b)
    if n_bad:
        i, a, b = first
        diffcols = [
            f"{c}: {x!r} vs {y!r}" for c, x, y in zip(s_cols, a, b) if x != y
        ]
        issues.append(f"{n_bad}/{len(s_rows)} rows differ; first @{i}: " + "; ".join(diffcols[:4]))
    else:
        flags["hash_match"] = True
    return issues, flags


def main() -> int:
    """Usage: python tools/verify_local.py [--json OUT.json] [name ...]"""
    import json

    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            print("usage: verify_local.py [--json OUT.json] "
                  "[--sample N [--seed S]] [name ...]")
            return 2
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    sample_n = None
    seed = 0
    for flag in ("--sample", "--seed"):
        if flag in argv:
            i = argv.index(flag)
            val = int(argv[i + 1])
            argv = argv[:i] + argv[i + 2 :]
            if flag == "--sample":
                sample_n = val
            else:
                seed = val
    only = set(argv)
    if sample_n is not None:
        # Stratified sample mirroring the driver's per-round shape (the
        # driver checks ~50 ops weighted by family): group by the op-name
        # family prefix, allocate proportionally (>=1 per touched
        # family), draw with a seeded rng — so a builder can rehearse
        # exactly the class of run the driver will do.
        import random as _random

        from dataengineeringutils_spark.registry import queries as _qs

        names = sorted(_qs())
        fams: dict[str, list[str]] = {}
        for n in names:
            fams.setdefault(n.split("_", 1)[0], []).append(n)
        rng = _random.Random(seed)
        picked: list[str] = []
        fam_items = sorted(fams.items())
        quota = {
            f: max(1, round(sample_n * len(v) / len(names)))
            for f, v in fam_items
        }
        for f, v in fam_items:
            picked += rng.sample(v, min(quota[f], len(v)))
        rng.shuffle(picked)
        only = set(picked[:sample_n]) | only
    spark = get_spark("verify_local")
    con = duck_connect(SF_DIR)
    qs = queries()
    oracles = oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    failures = []
    # per-op records in EXACTLY the driver's CORRECTNESS_r*.json row
    # schema ({rows_match, schema_match, hash_match, spark_rows,
    # oracle_rows, err}) so the artifact can be adopted wholesale;
    # timings live in a parallel map to keep the rows schema-pure
    results: dict[str, dict] = {}
    timings: dict[str, float] = {}

    def record(
        name,
        *,
        rows_match=False,
        schema_match=False,
        hash_match=False,
        spark_rows=None,
        oracle_rows=None,
        err=None,
    ):
        results[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": spark_rows,
            "oracle_rows": oracle_rows,
            "err": err,
        }

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_pdf = sdf.toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            record(name, err="spark error")
            timings[name] = round(time.time() - t0, 2)
            print(f"FAIL  {name}: spark error\n{traceback.format_exc()}")
            continue
        secs = round(time.time() - t0, 2)
        if name not in oracles:
            n_rows_only += 1
            record(
                name,
                rows_match=True,
                schema_match=True,
                hash_match=None,  # declared rows-only: no oracle by design
                spark_rows=len(spark_pdf),
            )
            timings[name] = secs
            print(f"rows  {name}: {len(spark_pdf)} rows ({secs:.1f}s) [rows-only]")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).fetchdf()
        except Exception:
            n_fail += 1
            failures.append(name)
            record(name, spark_rows=len(spark_pdf), err="duckdb oracle error")
            timings[name] = round(time.time() - t0, 2)
            print(f"FAIL  {name}: duckdb oracle error\n{traceback.format_exc()}")
            continue
        issues, flags = compare(name, spark_pdf, duck_pdf)
        secs = round(time.time() - t0, 2)
        timings[name] = secs
        record(
            name,
            **flags,
            spark_rows=len(spark_pdf),
            oracle_rows=len(duck_pdf),
            err=" | ".join(issues) if issues else None,
        )
        if issues:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name} ({secs:.1f}s): " + " | ".join(issues))
        else:
            n_pass += 1
            print(f"PASS  {name}: {len(spark_pdf)} rows ({secs:.1f}s)")
    print(
        f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"({len(qs)} total declared) =="
    )
    if failures:
        print("failures:", " ".join(failures))
    if json_out:
        with open(json_out, "w") as f:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_pass": n_pass,
                    "n_fail": n_fail,
                    "n_rows_only": n_rows_only,
                    "n_declared": len(qs),
                    "results": results,
                    "timings_secs": timings,
                },
                f,
                indent=1,
                sort_keys=True,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
