"""Deterministic synthetic change-event log over source-code repos.

This is the engine's test corpus: a binlog/WAL-style stream of
``I``/``U``/``D`` events keyed on ``(repo, path)`` with a global commit
sequence ``seq``.  It mirrors the reference's change stream
(CompositionMetadata + payload — ``/root/reference/src/adapters/openehr/
vendor/trait.rs:17-36``, ``src/domain/composition.rs:31-47``) recast per
BASELINE.json input_hint onto source-code repositories.

Everything is seeded and wall-clock-free so the pandas oracle and the
Spark replay see byte-identical input (FIXTURES.md §1).

Scenario knobs (each a flag, each a pytest scenario):
  * ``out_of_order_deletes`` — a ``D`` with seq=k *arrives after* a
    ``U`` with seq=k+1 for the same key; the newer row must survive.
  * ``duplicate_frac`` — verbatim re-delivery of a fraction of events.
  * ``schema_evolution`` — payload gains ``lines:int`` at ~40% of the
    stream, values widen past int32 at ~60%, key ``author`` renames to
    ``committer`` at ~80%.
  * ``hot_repo_frac`` — one repo receives this fraction of all events
    (skew/salting test); remaining repos are Zipf-ish distributed.

Row order in the output IS arrival order; ``seq`` is the logical commit
order.  They differ exactly where scenarios plant disorder.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

LANGS = np.array(["py", "rs", "go", "js", "md", "c", "java", "sql"])

# Arrival-time base (fixed, not wall clock).
_T0 = np.datetime64("2026-01-01T00:00:00", "us")


@dataclass
class ChangelogSpec:
    n_events: int = 20_000
    n_repos: int = 50
    paths_per_repo: int = 200
    seed: int = 42
    insert_frac: float = 0.30  # vs update; deletes carved out separately
    delete_frac: float = 0.05
    duplicate_frac: float = 0.0
    out_of_order_deletes: int = 0  # number of planted late-delete pairs
    schema_evolution: bool = False
    # nested-struct evolution (VERDICT r05 #6): payload carries a
    # ``meta`` OBJECT ({"owner": "uN"}) whose ``depth`` subfield only
    # appears from evo_add_at on — the deep-flatten mid-stream-add
    # scenario (reference models.rs:384-423)
    nested_evolution: bool = False
    hot_repo_frac: float = 0.0  # e.g. 0.30 → repo_00 gets 30% of events
    content_words: tuple[int, int] = (10, 120)  # min/max body lines
    # payload evolution breakpoints (fractions of the stream)
    evo_add_at: float = 0.40
    evo_widen_at: float = 0.60
    evo_rename_at: float = 0.80
    extra: dict = field(default_factory=dict)


def _zipf_repo_probs(n_repos: int, hot_frac: float) -> np.ndarray:
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    p = 1.0 / ranks  # Zipf s=1
    p /= p.sum()
    if hot_frac > 0:
        p = p * (1.0 - hot_frac) / p.sum()
        p[0] += hot_frac
    return p


def _hex40(rng: np.random.Generator, n: int) -> list[str]:
    raw = rng.integers(0, 256, size=(n, 20), dtype=np.uint8)
    h = raw.tobytes().hex()
    return [h[i * 40 : (i + 1) * 40] for i in range(n)]


def generate_changelog(spec: ChangelogSpec) -> pd.DataFrame:
    """Return the changelog as a pandas DataFrame in ARRIVAL order.

    Columns: seq:int64, op:str, repo:str, path:str, commit:str(40hex),
    lang:str, content:str, payload:str(json), ts:datetime64[us].
    """
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events

    repo_idx = rng.choice(
        spec.n_repos, size=n, p=_zipf_repo_probs(spec.n_repos, spec.hot_repo_frac)
    )
    path_idx = rng.integers(0, spec.paths_per_repo, size=n)

    # key id used for per-key bookkeeping
    key_id = repo_idx.astype(np.int64) * spec.paths_per_repo + path_idx

    seq = np.arange(n, dtype=np.int64)

    # op assignment: first touch of a key is I; later touches U, a slice D.
    first_touch = (~pd.Series(key_id).duplicated()).to_numpy()
    op = np.where(first_touch, "I", "U").astype(object)
    revisit = ~first_touch
    del_mask = revisit & (rng.random(n) < spec.delete_frac)
    op[del_mask] = "D"

    lang = LANGS[key_id % len(LANGS)]
    # vectorized name building (a 16M-row corpus can't afford per-row
    # Python format calls)
    repo = ("repo_" + pd.Series(repo_idx).astype(str).str.zfill(3)).to_numpy()
    kid = pd.Series(key_id)
    path = (
        "src/m"
        + ((kid // 31) % 97).astype(str).str.zfill(2)
        + "/f_"
        + (kid % 10007).astype(str)
        + ".txt"
    ).to_numpy()

    commit = _hex40(rng, n)

    # content: deterministic pseudo-code, unique per (key, seq)
    nonce = rng.integers(0, 1 << 30, size=n)
    nlines = rng.integers(spec.content_words[0], spec.content_words[1], size=n)
    fillers = np.array(
        [
            "".join(f"let v{j} = compute({j});\n" for j in range(m + 3))
            for m in range(17)
        ]
    )
    content = (
        "// " + pd.Series(repo) + "/" + pd.Series(path)
        + " seq=" + pd.Series(seq).astype(str)
        + " nonce=" + pd.Series(nonce).astype(str) + "\n"
        + pd.Series(fillers[nlines % 17])
    ).to_numpy()

    # payload json with schema evolution (vectorized piecewise build)
    author = rng.integers(0, 500, size=n)
    if spec.schema_evolution:
        add_at = int(n * spec.evo_add_at)
        widen_at = int(n * spec.evo_widen_at)
        rename_at = int(n * spec.evo_rename_at)
    else:
        add_at = widen_at = rename_at = n + 1
    small_lines = rng.integers(1, 2_000, size=n)
    big_lines = rng.integers(3_000_000_000, 9_000_000_000, size=n)  # > int32
    idx = np.arange(n)
    akey = np.where(idx >= rename_at, "committer", "author")
    lines_val = np.where(idx >= widen_at, big_lines, small_lines)
    lines_part = np.where(
        idx >= add_at,
        ', "lines": ' + pd.Series(lines_val).astype(str),
        "",
    )
    if spec.nested_evolution:
        nest_at = int(n * spec.evo_add_at)
        depth = rng.integers(0, 64, size=n)
        depth_part = np.where(
            idx >= nest_at,
            ', "depth": ' + pd.Series(depth).astype(str),
            "",
        )
        meta_part = (
            ', "meta": {"owner": "u' + pd.Series(author).astype(str)
            + '"' + pd.Series(depth_part) + "}"
        )
    else:
        meta_part = pd.Series([""] * n)
    payload = (
        '{"' + pd.Series(akey) + '": "u' + pd.Series(author).astype(str)
        + '"' + pd.Series(lines_part) + pd.Series(meta_part) + "}"
    ).tolist()

    ts = _T0 + (seq * 1_000_000 + rng.integers(0, 900_000, size=n)).astype(
        "timedelta64[us]"
    )

    # --- scenario: out-of-order deletes (array-level planting) ----------
    # For up to `out_of_order_deletes` D rows: retarget the NEXT row to
    # the same key as an Update (it keeps its own larger seq), then swap
    # the two ROW POSITIONS keeping each row's seq — the U (seq=s+1)
    # arrives first, the D (seq=s) arrives late.  A late delete must
    # lose to the newer upsert (north-star scenario).
    perm = np.arange(n)
    if spec.out_of_order_deletes > 0:
        repo = repo.copy()
        path = path.copy()
        planted = 0
        used: set[int] = set()
        for pos in np.flatnonzero(op == "D"):
            if planted >= spec.out_of_order_deletes:
                break
            nxt = pos + 1
            if nxt >= n or pos in used or nxt in used:
                continue
            repo[nxt] = repo[pos]
            path[nxt] = path[pos]
            op[nxt] = "U"
            perm[pos], perm[nxt] = nxt, pos
            used.update((pos, nxt))
            planted += 1

    df = pd.DataFrame(
        {
            "seq": seq[perm],
            "op": op[perm].astype(str),
            "repo": repo[perm],
            "path": path[perm],
            "commit": np.asarray(commit, dtype=object)[perm],
            "lang": lang[perm],
            "content": content[perm],
            "payload": np.asarray(payload, dtype=object)[perm],
            "ts": ts[perm],
        }
    )

    # --- scenario: duplicate delivery (vectorized reorder) --------------
    if spec.duplicate_frac > 0:
        m = max(1, int(n * spec.duplicate_frac))
        dup_idx = rng.choice(n, size=m, replace=False)
        insert_at = rng.integers(0, len(df), size=m)
        # arrival keys: originals at i, duplicates just after insert_at
        arrival = np.concatenate(
            [np.arange(len(df), dtype=np.float64), insert_at + 0.5]
        )
        df = pd.concat([df, df.iloc[dup_idx]], ignore_index=True)
        df = df.iloc[np.argsort(arrival, kind="stable")]

    return df.reset_index(drop=True)


def write_changelog(df: pd.DataFrame, out_dir: str, n_files: int = 8) -> list[str]:
    """Write the changelog as ``n_files`` parquet files preserving arrival
    order across files (file k holds arrival slice k) — the file-backed
    stream source reads them in name order."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    chunks = np.array_split(np.arange(len(df)), n_files)
    for i, idx in enumerate(chunks):
        p = os.path.join(out_dir, f"changelog-{i:05d}.parquet")
        df.iloc[idx].to_parquet(p, index=False)
        paths.append(p)
    return paths
