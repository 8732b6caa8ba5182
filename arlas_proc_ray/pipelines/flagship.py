"""Flagship pipeline: the CDC replay loop end-to-end.

tail (synthesized deterministic changelog) → normalize/schema-align →
LWW combine → hash-partition merge → compacted snapshot state.
"""

from __future__ import annotations

import os
import re

from arlas_proc_ray.cdc import ChangelogConfig, changelog_dataset, replay_to_dataset
from arlas_proc_ray.model import DataModel


def sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(os.path.normpath(sf_dir)))
    return float(m.group(1)) if m else 0.001


def changelog_config_for(sf_dir: str) -> ChangelogConfig:
    """Deterministic changelog sized to the scale factor (seed fixed)."""
    sf = sf_of(sf_dir)
    num_events = max(2_000, int(sf * 2_000_000))
    return ChangelogConfig(
        num_events=num_events,
        num_keys=max(200, num_events // 10),
        num_repos=50,
        seed=42,
    )


def cdc_replay_final_state(sf_dir: str, num_partitions: int = 32):
    """Full changelog replay → final-state Dataset (no sink)."""
    cfg = changelog_config_for(sf_dir)
    ds = changelog_dataset(cfg)
    return replay_to_dataset(ds, DataModel(num_partitions=num_partitions))


def entry_pipeline():
    """Driver smoke entry: flagship replay at sf0.001 scale."""
    return cdc_replay_final_state("/root/testdata/sf0.001", num_partitions=8)
