"""Changelog audit (cdc/audit.py): hand-built fixture with known
inversions, duplicate LSNs and gaps."""

import pandas as pd
import ray.data as rd

from arlas_proc_ray.cdc.audit import changelog_audit


def test_audit_metrics_exact():
    # user a: delivery order (d) gives lsn sequence 1,5,3,4 -> one adjacent
    # inversion (5 then 3); lsns {1,3,4,5} -> one gap (2)
    # user b: duplicate lsn 7 (twice), no inversion, no gap
    df = pd.DataFrame(
        [
            ("a", 1, 10),
            ("a", 5, 20),
            ("a", 3, 30),
            ("a", 4, 40),
            ("b", 7, 10),
            ("b", 7, 20),
            ("b", 8, 30),
        ],
        columns=["k", "lsn", "d"],
    )
    out = (
        changelog_audit(
            rd.from_pandas(df.sample(frac=1, random_state=1)).repartition(3),
            key_col="k",
            lsn_col="lsn",
            delivery_order_col="d",
            num_partitions=4,
        )
        .to_pandas()
        .set_index("k")
    )
    a, b = out.loc["a"], out.loc["b"]
    assert (a["n_events"], a["n_ooo"], a["n_dup_lsn"], a["lsn_gaps"]) == (4, 1, 0, 1)
    assert (a["lsn_min"], a["lsn_max"]) == (1, 5)
    assert (b["n_events"], b["n_ooo"], b["n_dup_lsn"], b["lsn_gaps"]) == (3, 0, 1, 0)
