"""arches_rascoll_etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch re-expression of the capabilities of
``opencontext/arches-rascoll-etl`` (reference at /root/reference, studied for
behavior only) as an idiomatic Ray Data engine:

- change events (insert/update/delete) over a Parquet table of source-code
  repositories ``(repo, path, commit, lang, content)`` are tailed into a
  ``ray.data.Dataset``,
- key-partitioned by ``hash(repo, path)``,
- applied as idempotent last-writer-wins upserts (keyed on a commit LSN) into
  a partitioned Parquet lake table via ``map_batches`` over zero-copy Arrow,
- with schema evolution as Arrow casts, an exactly-once sink built from
  per-partition write-ahead manifests + checkpointed offsets, and per-partition
  lineage (offset ranges, applied-LSN watermarks).

The reference's semantic core each piece derives from is documented per-module
with ``file:line`` citations into the reference repo.
"""

from arches_rascoll_etl_ray.config import EngineConfig, EvolutionSpec
from arches_rascoll_etl_ray.pipelines.cdc import CDCEngine

__all__ = ["EngineConfig", "EvolutionSpec", "CDCEngine"]
__version__ = "0.1.0"
