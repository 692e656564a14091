"""Single-threaded reference applier — the correctness oracle.

Deliberately simple: fold the changelog in **logical ``seq`` order**
(pure Python/pandas, no Spark) into the final
``{(repo, path) → (commit, lang, content, …)}`` state.  The Spark
engine — which consumes events in *arrival* order, chunked into
epochs, with tombstone guards — must converge to exactly this state,
byte-for-byte on ``sha256(content)`` per row (BASELINE.json
north_star).

Semantics folded here:
  * I/U: upsert the row (last-writer-wins by seq).
  * D: remove the row.  Folding in seq order makes the out-of-order
    arrival problem disappear by construction — which is exactly why
    this is the oracle and the engine has to work for it.
  * duplicate delivery: re-applying an identical event is a no-op.
  * schema evolution: payload fields are normalized under the rename
    rule (``author``→``committer``) and the widen rule
    (``lines`` → int64); see plans/schema_evolution.py for the
    engine-side equivalent.
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd


def apply_reference(changelog: pd.DataFrame,
                    payload_fields: dict | None = None
                    ) -> dict[tuple[str, str], dict]:
    """Fold the changelog (any row order) into final state, by seq.

    ``payload_fields``: extra evolved columns beyond the default rules
    — ``{column_name: fn(payload_dict) -> value}``, e.g. the nested
    deep-flatten scenario's ``{"meta_depth": lambda p:
    (p.get("meta") or {}).get("depth")}``."""
    ordered = changelog.sort_values("seq", kind="stable")
    state: dict[tuple[str, str], dict] = {}
    for row in ordered.itertuples(index=False):
        key = (row.repo, row.path)
        if row.op == "D":
            state.pop(key, None)
        else:
            payload = json.loads(row.payload) if row.payload else {}
            committer = payload.get("committer", payload.get("author"))
            lines = payload.get("lines")
            rec = {
                "repo": row.repo,
                "path": row.path,
                "commit": row.commit,
                "lang": row.lang,
                "content": row.content,
                "seq": int(row.seq),
                "committer": committer,
                "lines": int(lines) if lines is not None else None,
            }
            for col, fn in (payload_fields or {}).items():
                rec[col] = fn(payload)
            state[key] = rec
    return state


def expected_state_pdf(changelog: pd.DataFrame,
                       payload_fields: dict | None = None) -> pd.DataFrame:
    """Oracle final state as a DataFrame with the sha256 invariant column."""
    state = apply_reference(changelog, payload_fields)
    rows = []
    for rec in state.values():
        r = dict(rec)
        r["content_sha256"] = hashlib.sha256(
            rec["content"].encode("utf-8")
        ).hexdigest()
        rows.append(r)
    if not rows:
        return pd.DataFrame(
            columns=[
                "repo", "path", "commit", "lang", "content",
                "seq", "committer", "lines", "content_sha256",
            ]
        )
    out = pd.DataFrame(rows)
    out["lines"] = out["lines"].astype("Int64")
    return out.sort_values(["repo", "path"]).reset_index(drop=True)
