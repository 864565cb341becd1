"""Deterministic synthetic fixtures (FIXTURES.md F1/F2).

F1: `source_files` table (repo, path, commit, lang, content) — the
BASELINE.json input_hint shape. F2: `changelog` — a commit-ordered CDC
event log over those keys (insert/update/delete with resurrections and
Zipf-skewed repo popularity).

Everything derives from an integer seed; no wall clock, no process
randomness (FIXTURES.md "Determinism rules"). Content is composed from
a seeded fragment pool so generating millions of events stays cheap;
each (repo, path, version) still gets globally unique content via a
header line, which is what the sha256(content) invariant keys on.
"""

from __future__ import annotations

import hashlib
import os
import random

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["py", "go", "js", "rs", "java", "md"]

_VOCAB = (
    "def func return if else for while import package struct class let const "
    "var fn pub mod use match case switch break continue range len append push "
    "map filter reduce sum count index key value err error nil null none true "
    "false self this new delete insert update select from where group order"
).split()


def _fragment_pool(seed: int, pool_size: int = 512) -> list[str]:
    rng = np.random.default_rng([seed, 0xF2A6])
    sizes = np.clip(rng.lognormal(3.2, 0.8, pool_size).astype(int), 4, 400)
    pool = []
    for s in sizes:
        words = rng.choice(_VOCAB, size=int(s))
        lines = [" ".join(words[i : i + 8]) for i in range(0, len(words), 8)]
        pool.append("\n".join(lines))
    return pool


def render_content(pool: list[str], repo: str, path: str, version: int, commit: str) -> str:
    k = int.from_bytes(hashlib.md5(f"{repo}:{path}:{version}".encode()).digest()[:8], "little")
    n_frag = 1 + k % 6
    frags = [pool[(k * 2654435761 + i * 40503) % len(pool)] for i in range(n_frag)]
    header = f"// {repo}/{path} v{version} commit {commit}"
    return header + "\n" + "\n".join(frags)


def _commit_sha(seed: int, repo: str, path: str, version: int) -> str:
    return hashlib.sha1(f"{seed}:{repo}:{path}:{version}".encode()).hexdigest()


def _key_name(repo_i: int, path_i: int, seed: int) -> tuple[str, str, str]:
    repo = f"org{repo_i % 10}/repo{repo_i}"
    lang = LANGS[(repo_i * 31 + path_i * 7) % len(LANGS)]
    path = f"src/m{path_i % 8}/file{path_i}.{lang}"
    return repo, path, lang


def gen_changelog(
    n_events: int = 20_000,
    n_repos: int = 50,
    seed: int = 42,
    zipf_a: float = 1.3,
    p_update: float = 0.60,
    p_insert: float = 0.30,
    p_resurrect_of_delete: float = 0.15,
) -> pa.Table:
    """Commit-ordered CDC log: ~60% update / 30% insert / 10% delete, with
    ~15% of deleted keys later re-inserted (FIXTURES.md F2). Repo choice
    is Zipf(zipf_a)-skewed so hash-partition balance is non-trivial.
    """
    rnd = random.Random(seed)
    rng = np.random.default_rng([seed, 0xC0DE])
    pool = _fragment_pool(seed)

    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    probs = ranks ** (-zipf_a)
    probs /= probs.sum()
    repo_draw = rng.choice(n_repos, size=n_events, p=probs)
    op_draw = rng.random(n_events)

    live_by_repo: dict[int, list[int]] = {}
    live_count = 0
    dead: list[tuple[int, int]] = []  # (repo_i, path_i) tombstoned keys
    next_path: dict[int, int] = {}
    version: dict[tuple[int, int], int] = {}

    seqs = np.arange(1, n_events + 1, dtype=np.int64)
    ops: list[str] = []
    repos: list[str] = []
    paths: list[str] = []
    commits: list[str | None] = []
    langs: list[str | None] = []
    contents: list[str | None] = []

    for i in range(n_events):
        repo_i = int(repo_draw[i])
        r = op_draw[i]
        bucket = live_by_repo.get(repo_i)
        if r < p_insert or live_count == 0:
            op = "insert"
            if dead and rnd.random() < p_resurrect_of_delete:
                repo_i, path_i = dead.pop(rnd.randrange(len(dead)))
            else:
                path_i = next_path.get(repo_i, 0)
                next_path[repo_i] = path_i + 1
            live_by_repo.setdefault(repo_i, []).append(path_i)
            live_count += 1
        elif r < p_insert + p_update or not bucket:
            op = "update"
            if not bucket:  # fall back to any live repo
                repo_i = rnd.choice([k for k, v in live_by_repo.items() if v])
                bucket = live_by_repo[repo_i]
            path_i = bucket[rnd.randrange(len(bucket))]
        else:
            op = "delete"
            j = rnd.randrange(len(bucket))
            path_i = bucket[j]
            bucket[j] = bucket[-1]
            bucket.pop()
            live_count -= 1
            dead.append((repo_i, path_i))

        repo, path, lang = _key_name(repo_i, path_i, seed)
        ops.append(op)
        repos.append(repo)
        paths.append(path)
        if op == "delete":
            commits.append(None)
            langs.append(None)
            contents.append(None)
        else:
            key = (repo_i, path_i)
            v = version.get(key, 0) + 1
            version[key] = v
            sha = _commit_sha(seed, repo, path, v)
            commits.append(sha)
            langs.append(lang)
            contents.append(render_content(pool, repo, path, v, sha))

    return pa.table(
        {
            "commit_seq": seqs,
            "op": pa.array(ops, pa.string()),
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.large_string()),
        }
    )


def write_changelog(dir_path: str, tbl: pa.Table, rows_per_file: int = 100_000) -> list[str]:
    """Write the log as multiple commit_seq-ordered parquet files so reads
    parallelize and commit_seq row-group stats enable window pushdown."""
    os.makedirs(dir_path, exist_ok=True)
    files = []
    for start in range(0, tbl.num_rows, rows_per_file):
        chunk = tbl.slice(start, rows_per_file)
        f = os.path.join(dir_path, f"log-{start:010d}.parquet")
        pq.write_table(chunk, f, row_group_size=16_384)
        files.append(f)
    return files


def ensure_changelog(
    dir_path: str, n_events: int, n_repos: int, seed: int = 42, **kw
) -> str:
    """Generate-once cache (used by bench + entry); keyed by params in the path."""
    tag = f"n{n_events}_r{n_repos}_s{seed}"
    d = os.path.join(dir_path, tag)
    done = os.path.join(d, "_DONE")
    if not os.path.exists(done):
        tbl = gen_changelog(n_events=n_events, n_repos=n_repos, seed=seed, **kw)
        write_changelog(d, tbl)
        with open(done, "w") as f:
            f.write(tag)
    return d


def gen_campaigns_table(n: int = 64) -> pa.Table:
    """Deterministic overlapping campaign intervals over the events
    tables' fixed Jan-2024 span (arithmetic on primes, no RNG): the
    dimension side of the generic interval/range join. Durations of
    6h..4d over a 30-day window mean ~4-5 campaigns are active at any
    instant, so the join is genuinely many-to-many."""
    base = 1_704_067_200  # 2024-01-01T00:00:00Z
    ids, starts, ends, channels = [], [], [], []
    names = ["search", "social", "email", "display"]
    for i in range(n):
        start = base + (i * 7919 * 3600) % (25 * 86400)
        dur = 6 * 3600 + (i * 104729) % (4 * 86400)
        ids.append(i)
        starts.append(start * 1_000_000)
        ends.append((start + dur) * 1_000_000)
        channels.append(names[i % 4])
    return pa.table(
        {
            "campaign_id": pa.array(ids, pa.int64()),
            "channel": pa.array(channels, pa.string()),
            "ts_start": pa.array(starts, pa.timestamp("us")),
            "ts_end": pa.array(ends, pa.timestamp("us")),
        }
    )


def ensure_campaigns_parquet(cache_dir: str, n: int = 64) -> str:
    """Write-once cache of the campaigns table (the interval-join oracle
    SQL reads this path; the Ray query joins the same table)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"campaigns_n{n}.parquet")
    if not os.path.exists(path):
        tmp = path + f".tmp{os.getpid()}"
        pq.write_table(gen_campaigns_table(n), tmp)
        os.replace(tmp, path)
    return path


def oracle_final_state(changelog: pa.Table) -> pa.Table:
    """Reference fold: per (repo, path) keep the max-commit_seq event; drop
    keys whose winner is a delete. This is the ground truth the lake must
    converge to regardless of windowing, ordering, or duplicate delivery.
    """
    df = pl.from_arrow(changelog)
    out = (
        df.sort("commit_seq", descending=True)
        .unique(subset=["repo", "path"], keep="first", maintain_order=True)
        .filter(pl.col("op") != "delete")
        .drop("op")
        .sort(["repo", "path"])
    )
    return out.to_arrow()
