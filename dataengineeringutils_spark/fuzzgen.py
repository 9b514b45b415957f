"""Differential query fuzzer: seeded AST -> (DataFrame plan, ANSI SQL).

The 483 registered operators each carry a hand-written DuckDB oracle
(SURVEY.md §2); this module adds the complementary evidence class — a
*generative* gate that explores the expression space the hand-written
oracles can't enumerate. One seeded random AST is rendered twice:

* through the PySpark **DataFrame API** (``Column`` expression layer,
  the same code path every operator in this repo uses), and
* as an **ANSI SQL** string executed by DuckDB on the same parquet.

Any divergence in rows, schema, or values (exact for ints/strings/
dates, ULP-tolerant for float aggregation whose accumulation order is
engine-defined) is a bug in one engine, the renderer, or — the case
this gate exists to catch — a semantic misunderstanding baked into how
this repo composes Spark expressions.

Grammar (kept to the dialect-common core so a mismatch is always a
finding, never a dialect argument):

* shapes: global aggregate, grouped aggregate (1-2 keys, optional
  HAVING), keyed projection (ORDER BY pk LIMIT n), FK-join aggregate,
  dim-LEFT-JOIN-filtered-fact aggregate (NULL/zero semantics of
  COUNT/SUM over unmatched rows), set operation (UNION/INTERSECT/
  EXCEPT distinct semantics), window over a unique-pk table
  (ROW_NUMBER / RANK / running SUM, optional top-k filter),
  two-level aggregation (re-aggregate of a grouped inner aggregate),
  correlated EXISTS/NOT EXISTS (hashed semi/anti join) with a grouped
  dim output, PIVOT to wide (per-value conditional SUM) and the full
  pivot->unpivot round-trip back to long, and AS-OF join on events
  (backward/forward, strict/inclusive, optional max-gap tolerance —
  Spark side through operators/asof.asof_join, DuckDB side through
  native ASOF JOIN, so the union+window implementation is fuzzed
  against an independent engine's asof operator), and INTERVAL join
  (equi + time-range residual self-join on events, strict/inclusive
  bounds, inner/left, per-probe aggregates);
* scalar exprs: arithmetic (+,-,*, /const), ABS, CASE WHEN,
  ELSE-less CASE (manufactures NULLs: NULL propagation through
  arithmetic and NULL-skipping aggregation are first-class fuzz
  surface), COALESCE;
* predicates: numeric/date comparisons, categorical =/IN, AND/OR/NOT;
* group keys: categorical columns, YEAR()/MONTH() of timestamps,
  SUBSTRING of categoricals;
* aggregates: SUM/AVG/MIN/MAX over scalar exprs, COUNT(*),
  COUNT(col), COUNT(DISTINCT int-or-cat), and exact DECIMAL(18,2)
  SUM compared as a string (no float tolerance in the way).

Floats never appear in equality predicates or group keys, every query
carries an exact-typed key set that uniquely identifies output rows,
and every output column is explicitly aliased on both sides — so the
comparison (sort by keys, exact cells, tolerance only on float
measures) is deterministic per seed.

Scale note (100 TB): the fuzzer is a test-time artifact; the queries it
emits are single-pass scan->filter->hash-agg or FK-join->hash-agg plans
with pushed filters — the same shapes the operator library emits, at
toy SF. It exists to pin semantics, not to benchmark.
"""

from __future__ import annotations

import math
import random
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringutils_spark.tables import table

# --------------------------------------------------------------------
# Typed catalog of the fixture tables (domains sampled from sf0.001;
# generated constants stay inside [lo, hi] so predicates are selective
# but rarely empty).
# --------------------------------------------------------------------

CATALOG: dict[str, dict[str, Any]] = {
    "orders": {
        "pk": ["o_orderkey"],
        "num": {"o_totalprice": (1000.0, 500000.0)},
        "int": {"o_custkey": (1, 15000)},
        "cat": {
            "o_orderstatus": ["F", "O", "P"],
            "o_orderpriority": [
                "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
            ],
        },
        "date": {"o_orderdate": (1995, 2001)},
    },
    "lineitem": {
        # NOT unique in the synthetic fixture (duplicate (orderkey,
        # linenumber) pairs exist) — lineitem is excluded from the
        # keyed-projection shape, where LIMIT ties would be ambiguous.
        "pk": ["l_orderkey", "l_linenumber"],
        "pk_unique": False,
        "num": {
            "l_quantity": (1.0, 50.0),
            "l_extendedprice": (900.0, 105000.0),
            "l_discount": (0.0, 0.1),
            "l_tax": (0.0, 0.09),
        },
        "int": {"l_suppkey": (1, 1000), "l_partkey": (1, 20000)},
        "cat": {
            "l_returnflag": ["A", "N", "R"],
            "l_linestatus": ["F", "O"],
        },
        "date": {"l_shipdate": (1995, 2001)},
    },
    "customer": {
        "pk": ["c_custkey"],
        "num": {"c_acctbal": (-900.0, 9950.0)},
        "int": {"c_nationkey": (0, 24)},
        "cat": {
            "c_mktsegment": [
                "AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY",
            ],
        },
        "date": {},
    },
    "part": {
        "pk": ["p_partkey"],
        "num": {"p_retailprice": (900.0, 920.0)},
        "int": {"p_size": (1, 50)},
        "cat": {
            "p_type": [
                "ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD",
            ],
            "p_brand": ["Brand#1", "Brand#2", "Brand#13", "Brand#21", "Brand#34"],
        },
        "date": {},
    },
    "supplier": {
        "pk": ["s_suppkey"],
        "num": {"s_acctbal": (-900.0, 9950.0)},
        "int": {"s_nationkey": (0, 24)},
        "cat": {},
        "date": {},
    },
    "events": {
        "pk": ["event_id"],
        "num": {"value": (0.0, 330.0)},
        "int": {"user_id": (0, 14)},
        "cat": {
            "event_type": ["click", "error", "purchase", "signup", "view"],
        },
        "date": {},  # ts spans one month; YEAR/MONTH keys degenerate
    },
    "documents": {
        "pk": ["doc_id"],
        "num": {},
        "int": {"n_chars": (40, 560)},
        "cat": {
            "lang": ["de", "en", "es", "fr", "zh"],
            "source": ["src0", "src3", "src7", "src12", "src19"],
        },
        "date": {},
    },
}

# FK edges for the join shape: (fact, fact_col, dim, dim_col).
FK_JOINS: list[tuple[str, str, str, str]] = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

_CMPS = ["<", "<=", ">", ">="]


# --------------------------------------------------------------------
# AST generation. Nodes are plain tuples; the first element is the tag.
# --------------------------------------------------------------------


def _gen_num_expr(rng: random.Random, tab: dict, depth: int = 0) -> tuple:
    """Numeric scalar expression over one table's num/int columns."""
    nums = list(tab["num"]) + list(tab["int"])
    if depth >= 2 or rng.random() < 0.45:
        return ("col", rng.choice(nums))
    r = rng.random()
    if r < 0.3:
        op = rng.choice(["+", "-", "*"])
        return ("bin", op, _gen_num_expr(rng, tab, depth + 1),
                _gen_num_expr(rng, tab, depth + 1))
    if r < 0.45:
        # divide by a non-zero constant only: double division both sides
        return ("bin", "/", _gen_num_expr(rng, tab, depth + 1),
                ("lit", round(rng.uniform(1.5, 97.0), 3)))
    if r < 0.55:
        return ("abs", _gen_num_expr(rng, tab, depth + 1))
    if r < 0.7:
        # ELSE-less CASE: manufactures NULLs so NULL propagation through
        # arithmetic and NULL-skipping in SUM/AVG/MIN/MAX/COUNT is fuzzed
        return ("nullcase", _gen_pred(rng, tab, depth + 1),
                _gen_num_expr(rng, tab, depth + 1))
    if r < 0.8:
        # COALESCE consumes the NULLs nullcase manufactures
        return ("coalesce", _gen_num_expr(rng, tab, depth + 1),
                ("lit", round(rng.uniform(-5.0, 5.0), 2)))
    return ("case", _gen_pred(rng, tab, depth + 1),
            _gen_num_expr(rng, tab, depth + 1),
            _gen_num_expr(rng, tab, depth + 1))


def _gen_nonnull_expr(rng: random.Random, tab: dict) -> tuple:
    """Numeric expression that can never evaluate to NULL (the fixture's
    num/int columns are NULL-free): used where NULL-vs-absent must stay
    distinguishable, e.g. the pivoted measure."""
    nums = list(tab["num"]) + list(tab["int"])
    r = rng.random()
    if r < 0.5 or len(nums) == 1:
        return ("col", rng.choice(nums))
    if r < 0.8:
        return ("bin", rng.choice(["+", "-", "*"]),
                ("col", rng.choice(nums)), ("col", rng.choice(nums)))
    return ("bin", "/", ("col", rng.choice(nums)),
            ("lit", round(rng.uniform(1.5, 97.0), 3)))


def _gen_pred(rng: random.Random, tab: dict, depth: int = 0) -> tuple:
    """Boolean predicate over one table (no float equality)."""
    if depth < 2 and rng.random() < 0.3:
        op = rng.choice(["and", "or"])
        p = (op, _gen_pred(rng, tab, depth + 1), _gen_pred(rng, tab, depth + 1))
        return ("not", p) if rng.random() < 0.15 else p
    choices = []
    if tab["num"] or tab["int"]:
        choices.append("numcmp")
    if tab["cat"]:
        choices += ["cateq", "catin"]
    if tab["date"]:
        choices.append("datecmp")
    kind = rng.choice(choices)
    if kind == "numcmp":
        allnum = {**tab["num"], **tab["int"]}
        c = rng.choice(list(allnum))
        lo, hi = allnum[c]
        v = rng.uniform(lo, hi)
        if c in tab["int"]:
            v = int(v)
        else:
            v = round(v, 4)
        return ("cmp", rng.choice(_CMPS), ("col", c), ("lit", v))
    if kind == "cateq":
        c = rng.choice(list(tab["cat"]))
        return ("cateq", c, rng.choice(tab["cat"][c]))
    if kind == "catin":
        c = rng.choice(list(tab["cat"]))
        vals = sorted(rng.sample(tab["cat"][c], k=min(len(tab["cat"][c]),
                                                      rng.randint(1, 3))))
        return ("catin", c, vals)
    c = rng.choice(list(tab["date"]))
    y0, y1 = tab["date"][c]
    lit = f"{rng.randint(y0, y1)}-{rng.randint(1, 12):02d}-{rng.randint(1, 28):02d}"
    return ("cmp", rng.choice(_CMPS), ("col", c), ("datelit", lit))


def _gen_key(rng: random.Random, tab: dict) -> tuple:
    """Exact-typed group key: categorical, YEAR/MONTH, or SUBSTRING."""
    choices = []
    if tab["cat"]:
        choices += ["cat", "cat", "substr"]
    if tab["date"]:
        choices += ["year", "month"]
    if tab["int"]:
        choices.append("int")
    kind = rng.choice(choices)
    if kind == "cat":
        return ("col", rng.choice(list(tab["cat"])))
    if kind == "substr":
        return ("substr", rng.choice(list(tab["cat"])), rng.randint(1, 3))
    if kind == "int":
        return ("col", rng.choice(list(tab["int"])))
    return (kind, rng.choice(list(tab["date"])))


def _gen_agg(rng: random.Random, tab: dict) -> tuple:
    r = rng.random()
    if r < 0.12:
        return ("countstar",)
    if r < 0.22:
        allcols = list(tab["num"]) + list(tab["int"]) + list(tab["cat"])
        return ("count", rng.choice(allcols))
    if r < 0.34:
        dcols = list(tab["int"]) + list(tab["cat"])
        if dcols:
            return ("countd", rng.choice(dcols))
        return ("countstar",)
    if r < 0.44 and tab["num"]:
        # exact DECIMAL(18,2) sum, compared as a STRING: pins the
        # money-sum idiom the operator library uses everywhere with no
        # float tolerance in the way
        return ("dsum", rng.choice(list(tab["num"])))
    fn = rng.choice(["sum", "avg", "min", "max"])
    return (fn, _gen_num_expr(rng, tab))


def gen_query(seed: int) -> dict:
    """One seeded query AST. Same seed -> identical AST forever."""
    rng = random.Random(seed)
    shape = rng.choice(
        [
            "global_agg", "group_agg", "group_agg", "proj", "join_agg",
            "left_join_agg", "setop", "window", "agg_of_agg",
            "semi_anti", "pivot", "asof", "interval_join",
        ]
    )
    if shape == "interval_join":
        # equi + range residual self-join on events: per probe event,
        # the other events of the same user inside (ts, ts + h hours],
        # aggregated per probe — the interval-join class (joins.py
        # join_interval) was hand-oracled but fuzz-blind (round-6
        # VERDICT #4). Bound strictness, window width, join type, and
        # side predicates all vary.
        tab = CATALOG["events"]
        types = tab["cat"]["event_type"]
        return {
            "shape": shape, "tables": "events",
            "left_types": sorted(rng.sample(types, k=rng.randint(1, 2))),
            "right_types": sorted(rng.sample(types, k=rng.randint(1, 2))),
            "lo_op": rng.choice([">", ">="]),
            "hi_op": rng.choice(["<", "<="]),
            "hours": rng.randint(1, 96),
            "join": rng.choice(["inner", "left"]),
            "with_sum": rng.random() < 0.7,
            "with_maxts": rng.random() < 0.5,
            "left_where": [_gen_pred(rng, tab)] if rng.random() < 0.4 else [],
            "right_where": [_gen_pred(rng, tab)] if rng.random() < 0.4 else [],
            "where": [], "keys": [], "outs": [], "having": None,
        }
    if shape == "semi_anti":
        # correlated EXISTS / NOT EXISTS (round-6 VERDICT #4): dim rows
        # kept (semi) or rejected (anti) by a predicate-filtered fact
        # subquery, then grouped — the decorrelation path both engines
        # plan as a hashed semi/anti join.
        f_name, f_col, d_name, d_col = rng.choice(FK_JOINS)
        ft, dt = CATALOG[f_name], CATALOG[d_name]
        keys = _dedup([_gen_key(rng, dt) for _ in range(rng.randint(1, 2))])
        outs = [("countstar",)]
        if (dt["num"] or dt["int"]) and rng.random() < 0.7:
            outs.append(("sum", _gen_num_expr(rng, dt)))
        if (dt["num"] or dt["int"]) and rng.random() < 0.4:
            outs.append(_gen_agg(rng, dt))
        return {
            "shape": shape, "tables": (f_name, f_col, d_name, d_col),
            "mode": rng.choice(["semi", "anti"]),
            "fact_where": _gen_pred(rng, ft),
            "where": [_gen_pred(rng, dt)] if rng.random() < 0.5 else [],
            "keys": keys, "outs": outs, "having": None,
        }
    if shape == "pivot":
        # pivot to wide (one SUM column per pivot value) or full
        # pivot->unpivot round-trip back to long (round-6 VERDICT #4).
        # The pivoted measure is a never-NULL expression so a present
        # (key, value) combo is distinguishable from an absent one on
        # both engines (absent: NULL cell wide, dropped row long).
        t_name = rng.choice([t for t in CATALOG if CATALOG[t]["cat"]])
        tab = CATALOG[t_name]
        pcol = rng.choice(list(tab["cat"]))
        dom = tab["cat"][pcol]
        values = sorted(rng.sample(dom, k=rng.randint(2, len(dom))))
        for _ in range(8):
            key = _gen_key(rng, tab)
            if pcol not in key:
                break
        expr = _gen_nonnull_expr(rng, tab)
        return {
            "shape": shape, "tables": t_name, "pivot_col": pcol,
            "values": values, "key": key, "expr": expr,
            "mode": rng.choice(["wide", "long"]),
            "where": [_gen_pred(rng, tab)] if rng.random() < 0.5 else [],
            "keys": [], "outs": [], "having": None,
        }
    if shape == "asof":
        # as-of join on events (round-6 VERDICT #4): per-user nearest
        # click/view/etc. at-or-before (backward) or at-or-after
        # (forward) each probe event, optional strictness and max-gap
        # tolerance. Output is (event_id, matched ts): the matched
        # TIMESTAMP is deterministic even when several right rows tie
        # on it, unlike a value payload.
        tab = CATALOG["events"]
        types = tab["cat"]["event_type"]
        left_t = sorted(rng.sample(types, k=rng.randint(1, 2)))
        right_t = sorted(rng.sample(types, k=rng.randint(1, 2)))
        return {
            "shape": shape, "tables": "events",
            "left_types": left_t, "right_types": right_t,
            "direction": rng.choice(["backward", "forward"]),
            "strict": rng.random() < 0.3,
            "tol_hours": rng.randint(1, 72) if rng.random() < 0.4 else None,
            "left_where": [_gen_pred(rng, tab)] if rng.random() < 0.4 else [],
            "right_where": [_gen_pred(rng, tab)] if rng.random() < 0.4 else [],
            "where": [], "keys": [], "outs": [], "having": None,
        }
    if shape == "left_join_agg":
        # dim LEFT JOIN (fact WHERE pred): unmatched dim rows exercise
        # COUNT(col)=0 vs SUM(expr)=NULL semantics on both engines.
        f_name, f_col, d_name, d_col = rng.choice(FK_JOINS)
        ft, dt = CATALOG[f_name], CATALOG[d_name]
        fact_where = _gen_pred(rng, ft)  # always filtered: guarantees misses
        dim_where = [_gen_pred(rng, dt)] if rng.random() < 0.4 else []
        keys = _dedup([_gen_key(rng, dt) for _ in range(rng.randint(1, 2))])
        outs = [("countstar",), ("count", rng.choice(
            list(ft["num"]) + list(ft["int"])))]
        if rng.random() < 0.7:
            outs.append(("sum", _gen_num_expr(rng, ft)))
        if rng.random() < 0.4:
            outs.append(("max", _gen_num_expr(rng, ft)))
        return {
            "shape": shape, "tables": (f_name, f_col, d_name, d_col),
            "fact_where": fact_where, "where": dim_where,
            "keys": keys, "outs": outs, "having": None,
        }
    if shape == "setop":
        # one exact-typed column list, two predicates, distinct set
        # semantics (UNION / INTERSECT / EXCEPT).
        t_name = rng.choice(list(CATALOG))
        tab = CATALOG[t_name]
        pool = list(tab["cat"]) + list(tab["int"]) + tab["pk"]
        cols = sorted(rng.sample(pool, k=min(len(pool), rng.randint(1, 2))))
        return {
            "shape": shape, "tables": t_name, "op": rng.choice(
                ["union", "intersect", "except"]),
            "cols": cols,
            "where": [_gen_pred(rng, tab)], "where2": [_gen_pred(rng, tab)],
            "keys": [], "outs": [], "having": None,
        }
    if shape == "window":
        # unique-pk tables only: ROW_NUMBER ordered by pk is then total.
        t_name = rng.choice(
            [t for t in CATALOG if CATALOG[t].get("pk_unique", True)]
        )
        tab = CATALOG[t_name]
        pk = tab["pk"][0]
        part = _gen_key(rng, tab)
        wfuncs = []
        wfuncs.append(("row_number",))
        if tab["num"] or tab["int"]:
            if rng.random() < 0.7:
                wfuncs.append(("running_sum", _gen_num_expr(rng, tab)))
            if rng.random() < 0.5:
                allnum = list(tab["num"]) + list(tab["int"])
                wfuncs.append(("rank_by", rng.choice(allnum)))
        return {
            "shape": shape, "tables": t_name, "pk": pk, "part": part,
            "wfuncs": wfuncs,
            "where": [_gen_pred(rng, tab)] if rng.random() < 0.6 else [],
            "keys": [], "outs": [], "having": None,
            "topk": rng.choice([3, 5, 10]) if rng.random() < 0.5 else None,
        }
    if shape == "agg_of_agg":
        # inner GROUP BY k -> (s: double, n: bigint); outer re-aggregate.
        t_name = rng.choice(list(CATALOG))
        tab = CATALOG[t_name]
        inner_key = _gen_key(rng, tab)
        inner_expr = (
            _gen_num_expr(rng, tab) if (tab["num"] or tab["int"])
            else ("lit", 1)
        )
        outer = rng.sample(
            ["avg_s", "max_s", "min_s", "sum_s", "max_n", "sum_n", "count_g"],
            k=rng.randint(2, 4),
        )
        return {
            "shape": shape, "tables": t_name, "inner_key": inner_key,
            "inner_expr": inner_expr, "outer": sorted(outer),
            "where": [_gen_pred(rng, tab)] if rng.random() < 0.7 else [],
            "keys": [], "outs": [], "having": None,
        }
    if shape == "join_agg":
        f_name, f_col, d_name, d_col = rng.choice(FK_JOINS)
        ft, dt = CATALOG[f_name], CATALOG[d_name]
        where = []
        if rng.random() < 0.7:
            where.append(_gen_pred(rng, ft))
        if rng.random() < 0.5:
            where.append(_gen_pred(rng, dt))
        # group keys come from either side; aggregates likewise
        keys = []
        for _ in range(rng.randint(1, 2)):
            keys.append(_gen_key(rng, rng.choice([ft, dt])))
        outs = [_gen_agg(rng, rng.choice([ft, dt]))
                for _ in range(rng.randint(1, 3))]
        return {
            "shape": shape, "tables": (f_name, f_col, d_name, d_col),
            "where": where, "keys": _dedup(keys), "outs": outs,
            "having": rng.randint(1, 3) if rng.random() < 0.3 else None,
        }
    if shape == "proj":
        t_name = rng.choice(
            [t for t in CATALOG if CATALOG[t].get("pk_unique", True)]
        )
    else:
        t_name = rng.choice(list(CATALOG))
    tab = CATALOG[t_name]
    where = [_gen_pred(rng, tab)] if rng.random() < 0.8 else []
    if shape == "global_agg":
        outs = [_gen_agg(rng, tab) for _ in range(rng.randint(1, 4))]
        return {"shape": shape, "tables": t_name, "where": where,
                "keys": [], "outs": outs, "having": None}
    if shape == "group_agg":
        keys = _dedup([_gen_key(rng, tab) for _ in range(rng.randint(1, 2))])
        outs = [_gen_agg(rng, tab) for _ in range(rng.randint(1, 3))]
        return {"shape": shape, "tables": t_name, "where": where,
                "keys": keys, "outs": outs,
                "having": rng.randint(1, 3) if rng.random() < 0.3 else None}
    # proj: pk + scalar exprs, ORDER BY pk LIMIT n
    n_out = rng.randint(1, 3)
    outs = []
    for _ in range(n_out):
        if (tab["num"] or tab["int"]) and rng.random() < 0.7:
            outs.append(("scalar_num", _gen_num_expr(rng, tab)))
        elif tab["cat"]:
            c = rng.choice(list(tab["cat"]))
            outs.append(("scalar_str",
                         rng.choice([("upper", c), ("length", c),
                                     ("substr", c, rng.randint(1, 4))])))
        else:
            outs.append(("scalar_num", _gen_num_expr(rng, tab)))
    return {"shape": shape, "tables": t_name, "where": where,
            "keys": [("col", c) for c in tab["pk"]], "outs": outs,
            "having": None, "limit": rng.choice([20, 50, 100])}


def _dedup(keys: list[tuple]) -> list[tuple]:
    seen, out = set(), []
    for k in keys:
        if k not in seen:
            seen.add(k)
            out.append(k)
    return out


# --------------------------------------------------------------------
# SQL renderer (DuckDB side).
# --------------------------------------------------------------------


def _sql_expr(e: tuple) -> str:
    tag = e[0]
    if tag == "col":
        return e[1]
    if tag == "lit":
        return repr(e[1])
    if tag == "datelit":
        return f"TIMESTAMP '{e[1]}'"
    if tag == "bin":
        return f"({_sql_expr(e[2])} {e[1]} {_sql_expr(e[3])})"
    if tag == "abs":
        return f"ABS({_sql_expr(e[1])})"
    if tag == "case":
        return (f"(CASE WHEN {_sql_pred(e[1])} THEN {_sql_expr(e[2])} "
                f"ELSE {_sql_expr(e[3])} END)")
    if tag == "nullcase":
        return f"(CASE WHEN {_sql_pred(e[1])} THEN {_sql_expr(e[2])} END)"
    if tag == "coalesce":
        return f"COALESCE({_sql_expr(e[1])}, {_sql_expr(e[2])})"
    raise ValueError(f"expr {e}")


def _sql_pred(p: tuple) -> str:
    tag = p[0]
    if tag == "cmp":
        return f"({_sql_expr(p[2])} {p[1]} {_sql_expr(p[3])})"
    if tag == "cateq":
        return f"({p[1]} = '{p[2]}')"
    if tag == "catin":
        vals = ", ".join(f"'{v}'" for v in p[2])
        return f"({p[1]} IN ({vals}))"
    if tag in ("and", "or"):
        return f"({_sql_pred(p[1])} {tag.upper()} {_sql_pred(p[2])})"
    if tag == "not":
        return f"(NOT {_sql_pred(p[1])})"
    raise ValueError(f"pred {p}")


def _sql_key(k: tuple) -> str:
    tag = k[0]
    if tag == "col":
        return k[1]
    if tag == "year":
        return f"CAST(EXTRACT(YEAR FROM {k[1]}) AS BIGINT)"
    if tag == "month":
        return f"CAST(EXTRACT(MONTH FROM {k[1]}) AS BIGINT)"
    if tag == "substr":
        return f"SUBSTRING({k[1]}, 1, {k[2]})"
    raise ValueError(f"key {k}")


def _sql_agg(a: tuple) -> str:
    tag = a[0]
    if tag == "countstar":
        return "COUNT(*)"
    if tag == "count":
        return f"COUNT({a[1]})"
    if tag == "countd":
        return f"COUNT(DISTINCT {a[1]})"
    if tag == "dsum":
        return f"CAST(SUM(CAST({a[1]} AS DECIMAL(18,2))) AS VARCHAR)"
    fn = {"sum": "SUM", "avg": "AVG", "min": "MIN", "max": "MAX"}[tag]
    return f"CAST({fn}({_sql_expr(a[1])}) AS DOUBLE)"


def _sql_scalar(o: tuple) -> str:
    if o[0] == "scalar_num":
        return f"CAST({_sql_expr(o[1])} AS DOUBLE)"
    s = o[1]
    if s[0] == "upper":
        return f"UPPER({s[1]})"
    if s[0] == "length":
        return f"CAST(LENGTH({s[1]}) AS BIGINT)"
    return f"SUBSTRING({s[1]}, 1, {s[2]})"


_OUTER_SQL = {
    "avg_s": "CAST(AVG(s) AS DOUBLE)", "max_s": "CAST(MAX(s) AS DOUBLE)",
    "min_s": "CAST(MIN(s) AS DOUBLE)", "sum_s": "CAST(SUM(s) AS DOUBLE)",
    "max_n": "MAX(n)", "sum_n": "CAST(SUM(n) AS BIGINT)",
    "count_g": "COUNT(*)",
}


def to_sql(q: dict) -> str:
    """Render the AST as ANSI SQL for DuckDB (fixture views pre-registered)."""
    if q["shape"] == "semi_anti":
        f_name, f_col, d_name, d_col = q["tables"]
        neg = "NOT " if q["mode"] == "anti" else ""
        conds = [
            f"{neg}EXISTS (SELECT 1 FROM {f_name} WHERE "
            f"{f_name}.{f_col} = {d_name}.{d_col} AND "
            f"({_sql_pred(q['fact_where'])}))"
        ] + [_sql_pred(p) for p in q["where"]]
        sel, grp = [], []
        for i, k in enumerate(q["keys"]):
            sel.append(f"{_sql_key(k)} AS k{i}")
            grp.append(_sql_key(k))
        for i, o in enumerate(q["outs"]):
            sel.append(f"{_sql_agg(o)} AS c{i}")
        return (f"SELECT {', '.join(sel)} FROM {d_name} "
                f"WHERE {' AND '.join(conds)} GROUP BY {', '.join(grp)}")
    if q["shape"] == "pivot":
        t, pcol, key = q["tables"], q["pivot_col"], q["key"]
        where = [_sql_pred(p) for p in q["where"]]
        ex = _sql_expr(q["expr"])
        if q["mode"] == "wide":
            sel = [f"{_sql_key(key)} AS k0"] + [
                f"CAST(SUM(CASE WHEN {pcol} = '{v}' THEN {ex} END) "
                f"AS DOUBLE) AS c{i}"
                for i, v in enumerate(q["values"])
            ]
            w = f" WHERE {' AND '.join(where)}" if where else ""
            return (f"SELECT {', '.join(sel)} FROM {t}{w} "
                    f"GROUP BY {_sql_key(key)}")
        vals = ", ".join(f"'{v}'" for v in q["values"])
        conds = [f"{pcol} IN ({vals})"] + where
        return (
            f"SELECT {_sql_key(key)} AS k0, {pcol} AS k1, "
            f"CAST(SUM({ex}) AS DOUBLE) AS c0 FROM {t} "
            f"WHERE {' AND '.join(conds)} "
            f"GROUP BY {_sql_key(key)}, {pcol}"
        )
    if q["shape"] == "interval_join":
        lt = ", ".join(f"'{v}'" for v in q["left_types"])
        rt = ", ".join(f"'{v}'" for v in q["right_types"])
        lw = "".join(f" AND {_sql_pred(p)}" for p in q["left_where"])
        rw = "".join(f" AND {_sql_pred(p)}" for p in q["right_where"])
        sel = ["p.event_id AS k0", "COUNT(c.event_id) AS c0"]
        if q["with_sum"]:
            sel.append("CAST(SUM(c.value) AS DOUBLE) AS c1")
        if q["with_maxts"]:
            sel.append("MAX(c.ts) AS c2")
        jt = "JOIN" if q["join"] == "inner" else "LEFT JOIN"
        return (
            f"SELECT {', '.join(sel)} "
            f"FROM (SELECT * FROM events WHERE event_type IN ({lt}){lw}) p "
            f"{jt} (SELECT * FROM events WHERE event_type IN ({rt}){rw}) c "
            f"ON p.user_id = c.user_id AND c.event_id <> p.event_id "
            f"AND c.ts {q['lo_op']} p.ts "
            f"AND c.ts {q['hi_op']} p.ts + INTERVAL '{q['hours']} hours' "
            f"GROUP BY p.event_id"
        )
    if q["shape"] == "asof":
        lt = ", ".join(f"'{v}'" for v in q["left_types"])
        rt = ", ".join(f"'{v}'" for v in q["right_types"])
        lw = "".join(
            f" AND {_sql_pred(p)}" for p in q["left_where"])
        rw = "".join(
            f" AND {_sql_pred(p)}" for p in q["right_where"])
        op = {
            ("backward", False): ">=", ("backward", True): ">",
            ("forward", False): "<=", ("forward", True): "<",
        }[(q["direction"], q["strict"])]
        if q["tol_hours"] is None:
            c0 = "c.ts"
        else:
            gap = ("p.ts - c.ts" if q["direction"] == "backward"
                   else "c.ts - p.ts")
            c0 = (f"CASE WHEN {gap} <= INTERVAL '{q['tol_hours']} hours' "
                  f"THEN c.ts END")
        return (
            f"SELECT p.event_id AS k0, {c0} AS c0 "
            f"FROM (SELECT * FROM events WHERE event_type IN ({lt}){lw}) p "
            f"ASOF LEFT JOIN "
            f"(SELECT * FROM events WHERE event_type IN ({rt}){rw}) c "
            f"ON p.user_id = c.user_id AND p.ts {op} c.ts"
        )
    if q["shape"] == "left_join_agg":
        f_name, f_col, d_name, d_col = q["tables"]
        frm = (f"{d_name} LEFT JOIN (SELECT * FROM {f_name} WHERE "
               f"{_sql_pred(q['fact_where'])}) f ON {d_name}.{d_col} = f.{f_col}")
        where = ""
        if q["where"]:
            where = " WHERE " + " AND ".join(_sql_pred(p) for p in q["where"])
        sel, grp = [], []
        for i, k in enumerate(q["keys"]):
            sel.append(f"{_sql_key(k)} AS k{i}")
            grp.append(_sql_key(k))
        for i, o in enumerate(q["outs"]):
            sel.append(f"{_sql_agg(o)} AS c{i}")
        return (f"SELECT {', '.join(sel)} FROM {frm}{where} "
                f"GROUP BY {', '.join(grp)}")
    if q["shape"] == "setop":
        t = q["tables"]
        cols = ", ".join(f"{c} AS k{i}" for i, c in enumerate(q["cols"]))
        op = {"union": "UNION", "intersect": "INTERSECT",
              "except": "EXCEPT"}[q["op"]]
        w1 = " AND ".join(_sql_pred(p) for p in q["where"])
        w2 = " AND ".join(_sql_pred(p) for p in q["where2"])
        return (f"SELECT {cols} FROM {t} WHERE {w1} {op} "
                f"SELECT {cols} FROM {t} WHERE {w2}")
    if q["shape"] == "window":
        t, pk = q["tables"], q["pk"]
        part = _sql_key(q["part"])
        sel = [f"{pk} AS k0", f"{part} AS g0"]
        for i, wf in enumerate(q["wfuncs"]):
            if wf[0] == "row_number":
                e = f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {pk})"
            elif wf[0] == "running_sum":
                e = (f"CAST(SUM({_sql_expr(wf[1])}) OVER (PARTITION BY {part} "
                     f"ORDER BY {pk} ROWS BETWEEN UNBOUNDED PRECEDING AND "
                     f"CURRENT ROW) AS DOUBLE)")
            else:  # rank_by — NULLS LAST on both engines: Spark ASC is
                # NULLS FIRST, DuckDB ASC is NULLS LAST (ADVICE r6)
                e = (
                    f"RANK() OVER (PARTITION BY {part} "
                    f"ORDER BY {wf[1]} NULLS LAST, {pk})"
                )
            sel.append(f"{e} AS c{i}")
        where = ""
        if q["where"]:
            where = " WHERE " + " AND ".join(_sql_pred(p) for p in q["where"])
        inner = f"SELECT {', '.join(sel)} FROM {t}{where}"
        if q["topk"] is not None:
            return f"SELECT * FROM ({inner}) w WHERE c0 <= {q['topk']}"
        return inner
    if q["shape"] == "agg_of_agg":
        t = q["tables"]
        where = ""
        if q["where"]:
            where = " WHERE " + " AND ".join(_sql_pred(p) for p in q["where"])
        inner = (f"SELECT {_sql_key(q['inner_key'])} AS k, "
                 f"CAST(SUM({_sql_expr(q['inner_expr'])}) AS DOUBLE) AS s, "
                 f"COUNT(*) AS n FROM {t}{where} GROUP BY {_sql_key(q['inner_key'])}")
        outs = ", ".join(f"{_OUTER_SQL[o]} AS c{i}"
                         for i, o in enumerate(q["outer"]))
        return f"SELECT {outs} FROM ({inner}) i"
    if q["shape"] == "join_agg":
        f_name, f_col, d_name, d_col = q["tables"]
        frm = f"{f_name} JOIN {d_name} ON {f_name}.{f_col} = {d_name}.{d_col}"
    else:
        frm = q["tables"]
    where = ""
    if q["where"]:
        where = " WHERE " + " AND ".join(_sql_pred(p) for p in q["where"])
    sel, grp = [], []
    for i, k in enumerate(q["keys"]):
        sel.append(f"{_sql_key(k)} AS k{i}")
        grp.append(_sql_key(k))
    if q["shape"] == "proj":
        for i, o in enumerate(q["outs"]):
            sel.append(f"{_sql_scalar(o)} AS c{i}")
        order = ", ".join(f"k{i}" for i in range(len(q["keys"])))
        return (f"SELECT {', '.join(sel)} FROM {frm}{where} "
                f"ORDER BY {order} LIMIT {q['limit']}")
    for i, o in enumerate(q["outs"]):
        sel.append(f"{_sql_agg(o)} AS c{i}")
    sql = f"SELECT {', '.join(sel)} FROM {frm}{where}"
    if grp:
        sql += " GROUP BY " + ", ".join(grp)
    if q["having"] is not None and grp:
        sql += f" HAVING COUNT(*) >= {q['having']}"
    return sql


# --------------------------------------------------------------------
# DataFrame renderer (Spark side) — the layer under test.
# --------------------------------------------------------------------


def _sp_expr(e: tuple) -> Column:
    tag = e[0]
    if tag == "col":
        return F.col(e[1])
    if tag == "lit":
        return F.lit(e[1])
    if tag == "datelit":
        return F.lit(e[1]).cast("timestamp")
    if tag == "bin":
        a, b = _sp_expr(e[2]), _sp_expr(e[3])
        return {"+": a + b, "-": a - b, "*": a * b,
                "/": a.cast("double") / b}[e[1]]
    if tag == "abs":
        return F.abs(_sp_expr(e[1]))
    if tag == "case":
        return F.when(_sp_pred(e[1]), _sp_expr(e[2])).otherwise(_sp_expr(e[3]))
    if tag == "nullcase":
        return F.when(_sp_pred(e[1]), _sp_expr(e[2]))
    if tag == "coalesce":
        return F.coalesce(_sp_expr(e[1]), _sp_expr(e[2]))
    raise ValueError(f"expr {e}")


def _sp_pred(p: tuple) -> Column:
    tag = p[0]
    if tag == "cmp":
        a, b = _sp_expr(p[2]), _sp_expr(p[3])
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[p[1]]
    if tag == "cateq":
        return F.col(p[1]) == F.lit(p[2])
    if tag == "catin":
        return F.col(p[1]).isin(p[2])
    if tag == "and":
        return _sp_pred(p[1]) & _sp_pred(p[2])
    if tag == "or":
        return _sp_pred(p[1]) | _sp_pred(p[2])
    if tag == "not":
        return ~_sp_pred(p[1])
    raise ValueError(f"pred {p}")


def _sp_key(k: tuple) -> Column:
    tag = k[0]
    if tag == "col":
        return F.col(k[1])
    if tag == "year":
        return F.year(k[1]).cast("long")
    if tag == "month":
        return F.month(k[1]).cast("long")
    if tag == "substr":
        return F.substring(k[1], 1, k[2])
    raise ValueError(f"key {k}")


def _sp_agg(a: tuple) -> Column:
    tag = a[0]
    if tag == "countstar":
        return F.count(F.lit(1))
    if tag == "count":
        return F.count(a[1])
    if tag == "countd":
        return F.countDistinct(a[1])
    if tag == "dsum":
        return F.sum(F.col(a[1]).cast("decimal(18,2)")).cast("string")
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[tag]
    return fn(_sp_expr(a[1])).cast("double")


def _sp_scalar(o: tuple) -> Column:
    if o[0] == "scalar_num":
        return _sp_expr(o[1]).cast("double")
    s = o[1]
    if s[0] == "upper":
        return F.upper(F.col(s[1]))
    if s[0] == "length":
        return F.length(s[1]).cast("long")
    return F.substring(s[1], 1, s[2])


_OUTER_SP = {
    "avg_s": lambda: F.avg("s").cast("double"),
    "max_s": lambda: F.max("s").cast("double"),
    "min_s": lambda: F.min("s").cast("double"),
    "sum_s": lambda: F.sum("s").cast("double"),
    "max_n": lambda: F.max("n"),
    "sum_n": lambda: F.sum("n"),
    "count_g": lambda: F.count(F.lit(1)),
}


def to_spark(spark: SparkSession, sf_dir: str, q: dict) -> DataFrame:
    """Render the AST through the DataFrame API on the fixture parquet."""
    if q["shape"] == "semi_anti":
        f_name, f_col, d_name, d_col = q["tables"]
        fact = (
            table(spark, sf_dir, f_name)
            .filter(_sp_pred(q["fact_where"]))
            .select(f_col)
        )
        d = table(spark, sf_dir, d_name).join(
            fact, F.col(d_col) == F.col(f_col), f"left_{q['mode']}"
        )
        for p in q["where"]:
            d = d.filter(_sp_pred(p))
        keys = [_sp_key(k).alias(f"k{i}") for i, k in enumerate(q["keys"])]
        aggs = [_sp_agg(o).alias(f"c{i}") for i, o in enumerate(q["outs"])]
        return d.groupBy(*keys).agg(*aggs)
    if q["shape"] == "pivot":
        df = table(spark, sf_dir, q["tables"])
        for p in q["where"]:
            df = df.filter(_sp_pred(p))
        measure = F.sum(_sp_expr(q["expr"])).cast("double")
        wide = (
            df.groupBy(_sp_key(q["key"]).alias("k0"))
            .pivot(q["pivot_col"], q["values"])
            .agg(measure)
        )
        if q["mode"] == "wide":
            return wide.select(
                "k0",
                *[F.col(f"`{v}`").alias(f"c{i}")
                  for i, v in enumerate(q["values"])],
            )
        # round-trip: unpivot back to long; absent combos are NULL cells
        # in the wide frame and must not surface as rows (the SQL side
        # only ever has present combos)
        return wide.unpivot(["k0"], q["values"], "k1", "c0").filter(
            F.col("c0").isNotNull()
        )
    if q["shape"] == "interval_join":
        ev = table(spark, sf_dir, "events")
        left = ev.filter(F.col("event_type").isin(q["left_types"]))
        for p in q["left_where"]:
            left = left.filter(_sp_pred(p))
        right = ev.filter(F.col("event_type").isin(q["right_types"]))
        for p in q["right_where"]:
            right = right.filter(_sp_pred(p))
        p_ = left.select(
            F.col("event_id").alias("k0"),
            F.col("user_id").alias("p_uid"),
            F.col("ts").alias("p_ts"),
        )
        c_ = right.select(
            F.col("event_id").alias("c_id"),
            F.col("user_id").alias("c_uid"),
            F.col("ts").alias("c_ts"),
            F.col("value").alias("c_value"),
        )
        lo = (
            F.col("c_ts") > F.col("p_ts")
            if q["lo_op"] == ">"
            else F.col("c_ts") >= F.col("p_ts")
        )
        hi_bound = F.col("p_ts") + F.expr(f"INTERVAL {q['hours']} HOURS")
        hi = (
            F.col("c_ts") < hi_bound
            if q["hi_op"] == "<"
            else F.col("c_ts") <= hi_bound
        )
        joined = p_.join(
            c_,
            (F.col("p_uid") == F.col("c_uid"))
            & (F.col("c_id") != F.col("k0"))
            & lo
            & hi,
            q["join"],
        )
        aggs = [F.count("c_id").alias("c0")]
        if q["with_sum"]:
            aggs.append(F.sum("c_value").cast("double").alias("c1"))
        if q["with_maxts"]:
            aggs.append(F.max("c_ts").alias("c2"))
        return joined.groupBy("k0").agg(*aggs)
    if q["shape"] == "asof":
        from dataengineeringutils_spark.operators.asof import asof_join

        ev = table(spark, sf_dir, "events")
        left = ev.filter(F.col("event_type").isin(q["left_types"]))
        for p in q["left_where"]:
            left = left.filter(_sp_pred(p))
        right = ev.filter(F.col("event_type").isin(q["right_types"]))
        for p in q["right_where"]:
            right = right.filter(_sp_pred(p))
        tol = (
            F.expr(f"INTERVAL {q['tol_hours']} HOURS")
            if q["tol_hours"] is not None
            else None
        )
        out = asof_join(
            left.select("event_id", "user_id", "ts"),
            right.select("user_id", "ts", F.col("ts").alias("mts")),
            by="user_id",
            left_ts="ts",
            right_ts="ts",
            payload=["mts"],
            direction=q["direction"],
            strict=q["strict"],
            tolerance=tol,
        )
        return out.select(
            F.col("event_id").alias("k0"), F.col("asof_mts").alias("c0")
        )
    if q["shape"] == "left_join_agg":
        f_name, f_col, d_name, d_col = q["tables"]
        fact = table(spark, sf_dir, f_name).filter(_sp_pred(q["fact_where"]))
        df = table(spark, sf_dir, d_name).join(
            fact, F.col(d_col) == F.col(f_col), "left"
        )
        for p in q["where"]:
            df = df.filter(_sp_pred(p))
        keys = [_sp_key(k).alias(f"k{i}") for i, k in enumerate(q["keys"])]
        aggs = [_sp_agg(o).alias(f"c{i}") for i, o in enumerate(q["outs"])]
        return df.groupBy(*keys).agg(*aggs)
    if q["shape"] == "setop":
        t = table(spark, sf_dir, q["tables"])

        def side(preds):
            d = t
            for p in preds:
                d = d.filter(_sp_pred(p))
            return d.select(
                *[F.col(c).alias(f"k{i}") for i, c in enumerate(q["cols"])]
            )

        a, b = side(q["where"]), side(q["where2"])
        if q["op"] == "union":
            return a.union(b).distinct()
        if q["op"] == "intersect":
            return a.intersect(b)
        return a.subtract(b)  # EXCEPT (distinct) semantics
    if q["shape"] == "window":
        from pyspark.sql import Window as W

        df = table(spark, sf_dir, q["tables"])
        for p in q["where"]:
            df = df.filter(_sp_pred(p))
        pk, part = q["pk"], _sp_key(q["part"])
        cols = [F.col(pk).alias("k0"), part.alias("g0")]
        for i, wf in enumerate(q["wfuncs"]):
            if wf[0] == "row_number":
                e = F.row_number().over(W.partitionBy(part).orderBy(pk))
            elif wf[0] == "running_sum":
                e = (
                    F.sum(_sp_expr(wf[1]))
                    .over(
                        W.partitionBy(part)
                        .orderBy(pk)
                        .rowsBetween(W.unboundedPreceding, W.currentRow)
                    )
                    .cast("double")
                )
            else:  # rank_by — explicit NULLS LAST to match the SQL
                # renderer (Spark's ASC default is NULLS FIRST)
                e = F.rank().over(
                    W.partitionBy(part).orderBy(
                        F.col(wf[1]).asc_nulls_last(), pk
                    )
                )
            cols.append(e.alias(f"c{i}"))
        out = df.select(*cols)
        if q["topk"] is not None:
            out = out.filter(F.col("c0") <= q["topk"])
        return out
    if q["shape"] == "agg_of_agg":
        df = table(spark, sf_dir, q["tables"])
        for p in q["where"]:
            df = df.filter(_sp_pred(p))
        inner = df.groupBy(_sp_key(q["inner_key"]).alias("k")).agg(
            F.sum(_sp_expr(q["inner_expr"])).cast("double").alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        return inner.agg(
            *[_OUTER_SP[o]().alias(f"c{i}") for i, o in enumerate(q["outer"])]
        )
    if q["shape"] == "join_agg":
        f_name, f_col, d_name, d_col = q["tables"]
        df = table(spark, sf_dir, f_name).join(
            table(spark, sf_dir, d_name), F.col(f_col) == F.col(d_col)
        )
    else:
        df = table(spark, sf_dir, q["tables"])
    for p in q["where"]:
        df = df.filter(_sp_pred(p))
    keys = [_sp_key(k).alias(f"k{i}") for i, k in enumerate(q["keys"])]
    if q["shape"] == "proj":
        outs = [_sp_scalar(o).alias(f"c{i}") for i, o in enumerate(q["outs"])]
        return (df.select(*keys, *outs)
                .orderBy(*[f"k{i}" for i in range(len(keys))])
                .limit(q["limit"]))
    aggs = [_sp_agg(o).alias(f"c{i}") for i, o in enumerate(q["outs"])]
    if q["having"] is not None and keys:
        aggs.append(F.count(F.lit(1)).alias("__n"))
    if keys:
        out = df.groupBy(*keys).agg(*aggs)
    else:
        out = df.agg(*aggs)
    if q["having"] is not None and keys:
        out = out.filter(F.col("__n") >= q["having"]).drop("__n")
    return out


# --------------------------------------------------------------------
# Comparison: exact on keys/ints/strings/timestamps, tolerant on float
# measures (SUM/AVG accumulation order is engine-defined).
# --------------------------------------------------------------------


def compare_frames(
    spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame,
    rtol: float = 1e-9, atol: float = 1e-12,
) -> list[str]:
    """Return a list of divergence descriptions (empty == match)."""
    issues: list[str] = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return [f"columns: spark={sorted(spark_pdf.columns)} "
                f"duck={sorted(duck_pdf.columns)}"]
    if len(spark_pdf) != len(duck_pdf):
        return [f"rows: spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    if len(spark_pdf) == 0:
        return []
    cols = sorted(spark_pdf.columns)
    key_cols = [c for c in cols if c.startswith("k")]
    s = spark_pdf[cols]
    d = duck_pdf[cols]
    sort_by = key_cols if key_cols else cols
    # sort keys are exact-typed by construction; fall back to full-row
    # repr sort for the keyless (single-row global agg) shape
    if key_cols:
        s = s.sort_values(sort_by, kind="mergesort").reset_index(drop=True)
        d = d.sort_values(sort_by, kind="mergesort").reset_index(drop=True)
    for c in cols:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            a = sv.astype(float).to_numpy()
            b = dv.astype(float).to_numpy()
            ok = np.isclose(a, b, rtol=rtol, atol=atol, equal_nan=True)
            ok |= np.isnan(a) & np.isnan(b)
            if not ok.all():
                i = int(np.argmin(ok))
                issues.append(f"{c}: {a[i]!r} vs {b[i]!r} @row {i} "
                              f"({int((~ok).sum())} diffs)")
        else:
            av = [_canon(v) for v in sv.tolist()]
            bv = [_canon(v) for v in dv.tolist()]
            if av != bv:
                bad = [i for i, (x, y) in enumerate(zip(av, bv)) if x != y]
                i = bad[0]
                issues.append(f"{c}: {av[i]!r} vs {bv[i]!r} @row {i} "
                              f"({len(bad)} diffs)")
    return issues


def _canon(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def run_case(spark: SparkSession, con, sf_dir: str, seed: int) -> dict:
    """Run one seed end-to-end; returns {seed, ok, sql, issues}."""
    q = gen_query(seed)
    sql = to_sql(q)
    try:
        spark_pdf = to_spark(spark, sf_dir, q).toPandas()
        duck_pdf = con.execute(sql).df()
        issues = compare_frames(spark_pdf, duck_pdf)
    except Exception as e:  # noqa: BLE001 — recorded, not swallowed
        issues = [f"exception: {type(e).__name__}: {e}"]
    return {"seed": seed, "ok": not issues, "sql": sql, "issues": issues}
