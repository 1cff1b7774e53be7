"""Pure-pandas oracle: fold the change log into expected final state.

The analog of the reference's offline data_diff tool
(``/root/reference/server/tool/data_diff/main.go:39-77``), which
reconstructs per-PK insert/delete timelines and diffs final state.
"""

from __future__ import annotations

import hashlib

import pandas as pd


def fold_events(pdf: pd.DataFrame) -> dict[tuple[str, str], dict]:
    """Fold DML events (sorted by event_seq) to final per-key state."""
    state: dict[tuple[str, str], dict] = {}
    for r in pdf.sort_values("event_seq").itertuples():
        if r.event_type in ("insert", "update"):
            state[(r.repo, r.path)] = {
                "commit": r.commit,
                "lang": r.lang,
                "content": r.content,
                "last_event_seq": r.event_seq,
            }
        elif r.event_type == "delete":
            state.pop((r.repo, r.path), None)
    return state


def expected_hashes(pdf: pd.DataFrame) -> dict[tuple[str, str], str]:
    return {
        k: hashlib.sha256(v["content"].encode("utf-8")).hexdigest()
        for k, v in fold_events(pdf).items()
    }


def engine_hashes(table_df) -> dict[tuple[str, str], str]:
    return {
        (r["repo"], r["path"]): r["content_sha256"]
        for r in table_df.select("repo", "path", "content_sha256").collect()
    }
