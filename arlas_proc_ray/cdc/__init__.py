"""CDC replay / incremental-ingest core (the flagship per BASELINE.json).

A WAL/binlog tail of insert/update/delete change events over the
source-code-repositories table ``(repo, path, commit, lang, content)`` is
keyed by ``(repo, path)``, hash-partitioned, and applied as a last-writer-
wins (LWW by LSN) merge into compacted, epoch-fenced Parquet snapshots with
per-partition checkpoint manifests (crash-resume, effective exactly-once).

This is the Ray-Data re-expression of the reference's computational
signature — per-key, order-sensitive, stateful reduction of an event stream
into a current-state table (SURVEY.md §1.1) — with real incremental state
instead of Spark window tricks.
"""

from arlas_proc_ray.cdc.events import (
    CANONICAL_EVENT_SCHEMA,
    EVENT_SCHEMA_V1,
    EVENT_SCHEMA_V2,
    FINAL_STATE_SCHEMA,
    ChangelogConfig,
    changelog_dataset,
    default_registry,
    generate_changelog_tables,
)
from arlas_proc_ray.cdc.oracle import oracle_final_state
from arlas_proc_ray.cdc.replay import lww_reduce_table, normalize_stage, replay_to_dataset
from arlas_proc_ray.cdc.engine import CdcEngine
from arlas_proc_ray.cdc.diff import snapshot_diff
from arlas_proc_ray.cdc.ivm import incremental_agg_view
from arlas_proc_ray.cdc.publish import (
    publish_to_elasticsearch,
    read_publish_checkpoint,
)
from arlas_proc_ray.cdc.feed import change_feed
from arlas_proc_ray.cdc.views import (
    read_view,
    refresh_distinct_view,
    refresh_group_view,
    refresh_topk_view,
)
from arlas_proc_ray.cdc.constraints import (
    ConstraintViolation,
    load_constraints,
    save_constraints,
)
from arlas_proc_ray.cdc.engine import EpochAuditError

__all__ = [
    "ConstraintViolation",
    "EpochAuditError",
    "load_constraints",
    "save_constraints",
    "refresh_distinct_view",
    "refresh_topk_view",
    "publish_to_elasticsearch",
    "read_publish_checkpoint",
    "change_feed",
    "refresh_group_view",
    "read_view",
    "ChangelogConfig",
    "generate_changelog_tables",
    "changelog_dataset",
    "default_registry",
    "oracle_final_state",
    "lww_reduce_table",
    "normalize_stage",
    "replay_to_dataset",
    "CdcEngine",
    "snapshot_diff",
    "incremental_agg_view",
    "EVENT_SCHEMA_V1",
    "EVENT_SCHEMA_V2",
    "CANONICAL_EVENT_SCHEMA",
    "FINAL_STATE_SCHEMA",
]
