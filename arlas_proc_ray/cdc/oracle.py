"""Independent in-memory replay oracle (NOT the engine under test).

Mirror of the reference's golden-data-generator test strategy: expected
outputs are re-derived by an independent plain implementation
(/root/reference/src/test/scala/io/arlas/data/transform/testdata/
FlowFragmentDataGenerator.scala:34-120), never by the engine itself.

A plain Python dict keyed by ``(repo, path)``, applying events strictly in
``lsn`` order: DELETE removes the key, INSERT/UPDATE (any upsert) replaces
it (last-writer-wins). Produces the canonical final-state table of
FIXTURES.md §4.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from arlas_proc_ray.cdc.events import FINAL_STATE_SCHEMA


def oracle_final_state(tables: list[pa.Table]) -> pa.Table:
    """Replay event tables (any physical schema version) in lsn order."""
    rows: list[dict] = []
    for t in tables:
        names = t.column_names
        for r in t.to_pylist():
            rows.append(
                {
                    "lsn": r["lsn"],
                    "op": r["op"],
                    "repo": r["repo"],
                    "path": r["path"],
                    "commit": r["commit"],
                    "language": r["language"] if "language" in names else r.get("lang"),
                    "content": r.get("content"),
                    "content_size": r.get("content_size"),
                }
            )
    rows.sort(key=lambda r: r["lsn"])

    state: dict[tuple[str, str], dict] = {}
    for r in rows:
        key = (r["repo"], r["path"])
        if r["op"] == "DELETE":
            state.pop(key, None)
            continue
        if r["op"] == "PATCH":
            # partial image: non-null payload columns overlay the live row;
            # a patch on a dead/absent key is a no-op (cdc/patch.py contract)
            prev = state.get(key)
            if prev is None:
                continue
            content = r["content"] if r["content"] is not None else prev["content"]
            size = len(content) if content is not None else None
            state[key] = {
                **prev,
                "commit": r["commit"] if r["commit"] is not None else prev["commit"],
                "language": (
                    r["language"] if r["language"] is not None else prev["language"]
                ),
                "content": content,
                "content_size": size,
                "content_sha256": (
                    hashlib.sha256(content.encode("utf-8")).hexdigest()
                    if content is not None
                    else None
                ),
                "last_lsn": r["lsn"],
            }
            continue
        content = r["content"]
        size = r["content_size"]
        if size is None and content is not None:
            size = len(content)
        state[key] = {
            "repo": r["repo"],
            "path": r["path"],
            "commit": r["commit"],
            "language": r["language"],
            "content": content,
            "content_size": size,
            "content_sha256": (
                hashlib.sha256(content.encode("utf-8")).hexdigest()
                if content is not None
                else None
            ),
            "last_lsn": r["lsn"],
        }

    out = sorted(state.values(), key=lambda r: (r["repo"], r["path"]))
    return pa.Table.from_pylist(out, schema=FINAL_STATE_SCHEMA)
