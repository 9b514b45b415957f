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
