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
    first_touch = np.zeros(n, dtype=bool)
    seen: set[int] = set()
    kl = key_id.tolist()
    for i, k in enumerate(kl):
        if k not in seen:
            first_touch[i] = True
            seen.add(k)
    op = np.where(first_touch, "I", "U").astype(object)
    revisit = ~first_touch
    del_mask = revisit & (rng.random(n) < spec.delete_frac)
    op[del_mask] = "D"

    lang = LANGS[key_id % len(LANGS)]
    repo = pd.Series(repo_idx).map(lambda i: f"repo_{i:03d}").to_numpy()
    path = pd.Series(key_id).map(
        lambda k: f"src/m{(k // 31) % 97:02d}/f_{k % 10007}.txt"
    ).to_numpy()

    commit = _hex40(rng, n)

    # content: deterministic pseudo-code, unique per (key, seq)
    nonce = rng.integers(0, 1 << 30, size=n)
    nlines = rng.integers(spec.content_words[0], spec.content_words[1], size=n)
    base = pd.Series(
        [
            f"// {r}/{p} seq={s} nonce={x}\n"
            for r, p, s, x in zip(repo, path, seq, nonce)
        ]
    )
    filler = pd.Series(nlines).map(
        lambda m: "".join(f"let v{j} = compute({j});\n" for j in range(int(m) % 17 + 3))
    )
    content = (base + filler).to_numpy()

    # payload json with schema evolution
    author = rng.integers(0, 500, size=n)
    if spec.schema_evolution:
        add_at = int(n * spec.evo_add_at)
        widen_at = int(n * spec.evo_widen_at)
        rename_at = int(n * spec.evo_rename_at)
    else:
        add_at = widen_at = rename_at = n + 1
    small_lines = rng.integers(1, 2_000, size=n)
    big_lines = rng.integers(3_000_000_000, 9_000_000_000, size=n)  # > int32
    payload = []
    for i in range(n):
        akey = "committer" if i >= rename_at else "author"
        parts = [f'"{akey}": "u{author[i]}"']
        if i >= add_at:
            lv = big_lines[i] if i >= widen_at else small_lines[i]
            parts.append(f'"lines": {lv}')
        payload.append("{" + ", ".join(parts) + "}")

    ts = _T0 + (seq * 1_000_000 + rng.integers(0, 900_000, size=n)).astype(
        "timedelta64[us]"
    )

    df = pd.DataFrame(
        {
            "seq": seq,
            "op": op.astype(str),
            "repo": repo,
            "path": path,
            "commit": commit,
            "lang": lang,
            "content": content,
            "payload": payload,
            "ts": ts,
        }
    )

    # --- scenario: out-of-order deletes ---------------------------------
    # Pick keys with a D followed (in seq) by a U; swap their seq values so
    # the delete ARRIVES later but carries the OLDER seq.  Arrival order is
    # row order, so instead we swap rows' positions keeping seq assigned to
    # the op: emit U(seq=k+1) early, D(seq=k) late.
    planted = 0
    if spec.out_of_order_deletes > 0:
        d_positions = np.flatnonzero(df["op"].to_numpy() == "D")
        for pos in d_positions:
            if planted >= spec.out_of_order_deletes:
                break
            if pos + 1 >= n:
                continue
            # craft: the delete at `pos` swaps seq with a later update we
            # fabricate on the same key at position pos+? — simplest: swap
            # the entire rows of `pos` and the next same-key U if adjacent
            # enough; else synthesize by swapping seq with row pos+1 and
            # retargeting row pos+1 to the same key as an update.
            k_repo = df.at[pos, "repo"]
            k_path = df.at[pos, "path"]
            nxt = pos + 1
            # retarget next row to same key as an Update; it keeps its
            # own (larger) seq
            df.at[nxt, "repo"] = k_repo
            df.at[nxt, "path"] = k_path
            df.at[nxt, "op"] = "U"
            # swap ROW POSITIONS, keeping each row's seq: the U
            # (seq=s+1) now ARRIVES first, the D (seq=s) arrives late —
            # a late delete that must lose to the newer upsert.
            row_d = df.iloc[pos].copy()
            row_u = df.iloc[nxt].copy()
            df.iloc[pos] = row_u
            df.iloc[nxt] = row_d
            planted += 1

    # --- scenario: duplicate delivery -----------------------------------
    if spec.duplicate_frac > 0:
        m = max(1, int(n * spec.duplicate_frac))
        dup_rows = df.iloc[rng.choice(n, size=m, replace=False)].copy()
        insert_at = rng.integers(0, len(df), size=m)
        pieces = []
        prev = 0
        order = np.argsort(insert_at)
        for j in order:
            at = int(insert_at[j])
            pieces.append(df.iloc[prev:at])
            pieces.append(dup_rows.iloc[[j]])
            prev = at
        pieces.append(df.iloc[prev:])
        df = pd.concat(pieces, ignore_index=True)

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
