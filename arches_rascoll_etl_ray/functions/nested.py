"""Nested-value constructors mirroring the reference's JSONB shapes
(SURVEY.md §1.2) as native Arrow types, built vectorized.

- language-dict: {lang: {value, direction}} — reference
  `make_lang_dict_value` (arches_rascoll/general_configs.py:61-67)
- related-resource object: {resourceId, ontologyProperty,
  resourceXresourceId, inverseOntologyProperty} — reference
  rel-obj builder (arches_rascoll/ref_collection.py:168-178)
- GeoJSON point: {type: 'Point', coordinates: [lon, lat]} — reference
  `make_geo_point_geojson` (arches_rascoll/places.py:22-31)

IDs are deterministic uuid5 (replay-stable), not the reference's uuid4
(ref_collection.py:167) — see functions/hashing.deterministic_uuid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from arches_rascoll_etl_ray.functions.hashing import deterministic_uuid

LANG_DICT_TYPE = pa.struct(
    [("lang", pa.string()), ("value", pa.string()), ("direction", pa.string())]
)

REL_OBJ_TYPE = pa.struct(
    [
        ("resourceId", pa.string()),
        ("ontologyProperty", pa.string()),
        ("resourceXresourceId", pa.string()),
        ("inverseOntologyProperty", pa.string()),
    ]
)

GEO_POINT_TYPE = pa.struct([("type", pa.string()), ("coordinates", pa.list_(pa.float64()))])


def make_lang_dict_column(
    values: pa.Array | pa.ChunkedArray,
    lang: str | pa.Array | pa.ChunkedArray = "en",
) -> pa.Array:
    """Vectorized struct build of the language-dict shape (null-preserving).
    `lang` is a constant code or a per-row string array."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    n = len(values)
    if isinstance(lang, pa.ChunkedArray):
        lang = lang.combine_chunks()
    langs = lang.cast(pa.string()) if isinstance(lang, pa.Array) else pa.array([lang] * n, pa.string())
    direction = pa.array(["ltr"] * n, pa.string())
    return pa.StructArray.from_arrays(
        [langs, values.cast(pa.string()), direction],
        fields=list(LANG_DICT_TYPE),
        mask=pc.is_null(values),
    )


def make_related_resource_column(
    resource_ids: pa.Array | pa.ChunkedArray,
    ontology_property: str = "",
    inverse_ontology_property: str = "",
    source_key: str = "relobj",
) -> pa.Array:
    """One related-resource struct per row; resourceXresourceId minted as
    uuid5(source_key, resourceId) so replays reconverge byte-identically."""
    if isinstance(resource_ids, pa.ChunkedArray):
        resource_ids = resource_ids.combine_chunks()
    rid_py = resource_ids.to_pylist()
    xids = pa.array(
        [None if r is None else deterministic_uuid(source_key, str(r)) for r in rid_py],
        pa.string(),
    )
    n = len(resource_ids)
    return pa.StructArray.from_arrays(
        [
            resource_ids.cast(pa.string()),
            pa.array([ontology_property] * n, pa.string()),
            xids,
            pa.array([inverse_ontology_property] * n, pa.string()),
        ],
        fields=list(REL_OBJ_TYPE),
        mask=pc.is_null(resource_ids),
    )


def make_geo_point_column(lon, lat) -> pa.Array:
    """GeoJSON Point structs from float columns; NaN coords → null (the
    reference's NaN guard, places.py:59-60)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    bad = np.isnan(lon) | np.isnan(lat)
    coords = np.empty((len(lon), 2), dtype=np.float64)
    coords[:, 0] = lon
    coords[:, 1] = lat
    flat = pa.array(coords.reshape(-1), pa.float64())
    coord_list = pa.FixedSizeListArray.from_arrays(flat, 2).cast(pa.list_(pa.float64()))
    types = pa.array(["Point"] * len(lon), pa.string())
    return pa.StructArray.from_arrays(
        [types, coord_list], fields=list(GEO_POINT_TYPE), mask=pa.array(bad)
    )
