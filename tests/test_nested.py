"""Nested-value constructors (FIXTURES.md F4 `nested_values` fixture)."""

import math

import pyarrow as pa

from arches_rascoll_etl_ray.functions.nested import (
    GEO_POINT_TYPE,
    LANG_DICT_TYPE,
    REL_OBJ_TYPE,
    make_geo_point_column,
    make_lang_dict_column,
    make_related_resource_column,
)


def test_lang_dict_struct():
    out = make_lang_dict_column(pa.array(["hello", None]), lang="en")
    assert out.type == LANG_DICT_TYPE
    rows = out.to_pylist()
    assert rows[0] == {"lang": "en", "value": "hello", "direction": "ltr"}
    assert rows[1] is None


def test_related_resource_deterministic_ids():
    a = make_related_resource_column(pa.array(["r1", "r2", None]), ontology_property="P67")
    b = make_related_resource_column(pa.array(["r1", "r2", None]), ontology_property="P67")
    assert a.type == REL_OBJ_TYPE
    ra, rb = a.to_pylist(), b.to_pylist()
    assert ra == rb  # uuid5, replay-stable (vs reference uuid4)
    assert ra[0]["resourceXresourceId"] != ra[1]["resourceXresourceId"]
    assert ra[2] is None


def test_geo_point_nan_guard():
    out = make_geo_point_column([1.5, math.nan], [2.5, 3.0])
    assert out.type == GEO_POINT_TYPE
    rows = out.to_pylist()
    assert rows[0] == {"type": "Point", "coordinates": [1.5, 2.5]}
    assert rows[1] is None


def test_json_roundtrip_and_error_null():
    from arches_rascoll_etl_ray.functions.json_io import (
        revive_json_columns,
        stringify_nested_columns,
        try_parse_json_column,
    )

    parsed = try_parse_json_column(pa.array(['{"a": 1}', "not json", None]))
    assert parsed.to_pylist() == [{"a": 1}, None, None]

    t = pa.table({"id": [1], "geo": make_geo_point_column([1.0], [2.0])})
    s = stringify_nested_columns(t, ["geo"])
    assert s["geo"].to_pylist() == ['{"coordinates":[1.0,2.0],"type":"Point"}']
    r = revive_json_columns(s, ["geo"])
    assert r["geo"].to_pylist()[0]["type"] == "Point"
