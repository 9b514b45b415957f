"""Property tests for the metadata layer (meta.py, A1-A6) — the
reference's core contract: JSON metadata documents round-trip losslessly
and the schema/DDL/conformance renderings stay mutually consistent for
ANY valid document, not just the handwritten fixtures in test_meta.py.
No Spark jobs: everything here is schema-level, so the suite is fast.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from dataengineeringutils_spark.meta import (
    TableMeta,
    translate_metadata_type_to_type,
)

_TYPES = [
    "character",
    "int",
    "long",
    "float",
    "double",
    "decimal",
    "date",
    "datetime",
    "boolean",
    "array<float>",
    "array<character>",
    "binary",
]

_name = st.from_regex(r"[a-z][a-z0-9_]{0,15}", fullmatch=True)

_columns = st.lists(
    st.builds(
        lambda n, t, d: {"name": n, "type": t, "description": d},
        _name,
        st.sampled_from(_TYPES),
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Nd", "Zs")),
            max_size=20,
        ),
    ),
    min_size=1,
    max_size=8,
    unique_by=lambda c: c["name"],
)


@st.composite
def _meta_dicts(draw):
    cols = draw(_columns)
    # partitions must be a subset of columns, and at least one column
    # must remain unpartitioned (a table of only partition columns has
    # an empty main DDL)
    max_parts = len(cols) - 1
    parts = draw(
        st.lists(
            st.sampled_from([c["name"] for c in cols]),
            max_size=max_parts,
            unique=True,
        )
        if max_parts > 0
        else st.just([])
    )
    return {
        "name": draw(_name),
        "data_format": draw(st.sampled_from(["parquet", "csv", "json"])),
        "location": draw(
            st.sampled_from(["", "s3://bkt/key/", "/local/dir"])
        ),
        "columns": cols,
        "partitions": parts,
    }


@given(d=_meta_dicts())
@settings(max_examples=60, deadline=None)
def test_metadata_dict_round_trip(d):
    """A1: from_dict -> to_dict is lossless for every declared field."""
    meta = TableMeta.from_dict(d)
    back = meta.to_dict()
    assert back["name"] == d["name"]
    assert back["data_format"] == d["data_format"]
    assert back["location"] == d["location"]
    assert back["partitions"] == d["partitions"]
    assert [c["name"] for c in back["columns"]] == [
        c["name"] for c in d["columns"]
    ]
    assert [c["type"] for c in back["columns"]] == [
        c["type"] for c in d["columns"]
    ]
    # and the round-trip is a fixpoint
    assert TableMeta.from_dict(back).to_dict() == back


@given(d=_meta_dicts())
@settings(max_examples=60, deadline=None)
def test_schema_ddl_consistency(d):
    """A3: spark_schema covers every column; ddl() covers exactly the
    non-partition columns; create_table_sql mentions every column once
    and normalizes an s3 location to the connector scheme."""
    meta = TableMeta.from_dict(d)
    schema = meta.spark_schema()
    assert [f.name for f in schema] == meta.column_names
    for f, c in zip(schema, meta.columns):
        assert f.dataType == translate_metadata_type_to_type(c.type, "spark")
    # split on ", " (the column separator) — a bare "," would split
    # inside decimal(18,2)
    ddl_names = [
        chunk.strip().split(" ")[0]
        for chunk in meta.ddl().split(", ")
        if chunk.strip()
    ]
    assert ddl_names == [
        c.name for c in meta.columns if c.name not in meta.partitions
    ]
    sql = meta.create_table_sql()
    for c in meta.columns:
        assert c.name in sql
    if meta.partitions:
        assert "PARTITIONED BY" in sql
    else:
        assert "PARTITIONED BY" not in sql
    if d["location"].startswith("s3://"):
        assert "LOCATION 's3a://" in sql
    elif d["location"]:
        assert f"LOCATION '{d['location']}'" in sql


@given(d=_meta_dicts())
@settings(max_examples=40, deadline=None)
def test_unknown_type_rejected(d):
    import pytest

    bad = dict(d)
    bad["columns"] = d["columns"] + [{"name": "zzbad", "type": "not_a_type"}]
    meta = TableMeta.from_dict(bad)  # lazy: translation happens on render
    with pytest.raises(ValueError, match="unknown metadata type"):
        meta.spark_schema()


# ---------------------------------------------------------------------
# Adversarial conformance properties (round-6 VERDICT #6): impose_types /
# conform driven by hypothesis-generated metadata against LIVE frames —
# unicode/dotted column names, decimal precision edges, date/timestamp
# crossovers, and missing/extra/reordered columns. These found (and now
# pin) the dotted-name resolution bug fixed by meta._qcol.
# ---------------------------------------------------------------------

from hypothesis import HealthCheck

from dataengineeringutils_spark.meta import (  # noqa: E402
    conform,
    conforms,
    conformance_report,
    impose_column_order,
    impose_types,
)

# names stress the RESOLVER: unicode letters, digits, dots, dashes,
# spaces, backticks — everything a JSON metadata document can declare
_hard_name = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Lo", "Nd"),
        whitelist_characters=" ._-`",
    ),
    min_size=1,
    max_size=12,
).filter(lambda s: s.strip() == s and s.strip("`") != "")

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(
    # unique CASE-INSENSITIVELY: Spark's analyzer resolves column names
    # with spark.sql.caseSensitive=false, so a document declaring both
    # 'a' and 'A' is ambiguous BY ENGINE SEMANTICS (AMBIGUOUS_REFERENCE),
    # not mishandled by this layer
    names=st.lists(
        _hard_name, min_size=1, max_size=4, unique_by=lambda s: s.lower()
    ),
    extra=st.booleans(),
    reorder=st.booleans(),
)
@_SETTINGS
def test_conform_resolves_any_declared_name(spark, names, extra, reorder):
    """Any declared column NAME must resolve literally: reordered and
    extra frame columns handled, declared order and types imposed."""
    meta = TableMeta.from_dict(
        {
            "name": "t",
            "columns": [{"name": n, "type": "long"} for n in names],
        }
    )
    frame_cols = list(reversed(names)) if reorder else list(names)
    if extra:
        frame_cols = frame_cols + ["__extra__"]
    row = tuple(str(i) for i in range(len(frame_cols)))
    df = spark.createDataFrame([row], frame_cols)
    out = conform(df, meta)
    assert out.columns == names
    assert conforms(out, meta)
    vals = out.collect()[0]
    pos = {c: i for i, c in enumerate(frame_cols)}
    for n in names:
        assert vals[n] == int(pos[n])


@given(names=st.lists(_hard_name, min_size=2, max_size=4, unique=True))
@_SETTINGS
def test_missing_column_raises_with_names(spark, names):
    meta = TableMeta.from_dict(
        {"name": "t", "columns": [{"name": n, "type": "long"} for n in names]}
    )
    df = spark.createDataFrame([("0",)], [names[0]])  # drop the rest
    import pytest

    with pytest.raises(ValueError, match="columns missing"):
        impose_column_order(df, meta)


@given(
    p=st.integers(min_value=1, max_value=38),
    s_frac=st.floats(min_value=0.0, max_value=1.0),
)
@_SETTINGS
def test_decimal_precision_edges(spark, p, s_frac):
    """Max-magnitude decimal(p,s) values survive strict imposition
    exactly; a value one digit wider nulls under try_cast and is counted
    by the conformance report."""
    from decimal import Decimal

    s = int(round(s_frac * p))
    typ = f"decimal({p},{s})"
    meta = TableMeta.from_dict(
        {"name": "t", "columns": [{"name": "d", "type": typ}]}
    )
    fits = ("9" * (p - s) or "0") + ("." + "9" * s if s else "")
    too_wide = "9" * (p - s + 1) + ("." + "9" * s if s else "")
    df = spark.createDataFrame([(fits,), (too_wide,)], ["d"])
    lax = impose_types(df, meta, strict=False).collect()
    got = {str(r["d"]) for r in lax}
    assert str(Decimal(fits)) in got
    assert None in {r["d"] for r in lax}  # overflow -> NULL under try_cast
    rep = conformance_report(df, meta).collect()[0]
    assert rep["d_cast_failures"] == 1


@given(
    y=st.integers(min_value=1971, max_value=2260),
    mo=st.integers(min_value=1, max_value=12),
    d=st.integers(min_value=1, max_value=28),
    h=st.integers(min_value=0, max_value=23),
)
@_SETTINGS
def test_date_timestamp_crossover(spark, y, mo, d, h):
    """A timestamp-typed frame column declared as date truncates to the
    civil date (session UTC); declared as datetime it is preserved."""
    import datetime

    ts = datetime.datetime(y, mo, d, h, 30, 59)
    for typ, want in (
        ("date", datetime.date(y, mo, d)),
        ("datetime", ts),
    ):
        meta = TableMeta.from_dict(
            {"name": "t", "columns": [{"name": "c", "type": typ}]}
        )
        df = spark.createDataFrame([(ts,)], "c timestamp")
        out = impose_types(df, meta).collect()[0]["c"]
        assert out == want, (typ, out, want)
