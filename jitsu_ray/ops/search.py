"""Distributed inverted index + conjunctive term search (SURVEY §2.11).

The reference routes and filters events but has no content search; a
training-data pipeline needs one (corpus audits, targeted extraction,
contamination spot-checks). Ray-Data-first design:

- ``build_inverted_index``: one tokenizing combiner pass (per-batch
  polars explode + tf count — each document lives in exactly one input
  row, so per-batch tf counts are already FINAL, no re-aggregation) and
  ONE shuffle keyed ``hash(term, bucket) % num_shards`` where ``bucket
  = doc_id // bucket_span``; each shard folds all its (term, bucket)
  groups in one vectorized polars pass. Postings are many bounded rows
  per term, never one giant list — a stopword's postings spread across
  buckets, so no single task ever holds a hot term's full docs list
  (the 100-TB failure mode of term-keyed indexes).
- ``conjunctive_search``: filter the index rows to the probe terms
  (tiny), one ``groupby(bucket)`` co-locates each bucket's posting rows
  for all terms, and a vectorized ``np.intersect1d`` chain inside
  ``map_groups`` ANDs them — intersection work is distributed per
  bucket and bounded by the smallest posting list.
- ``term_df``: global document frequency = a Sum fold of the bucket-
  local ``df`` column (mergeable by construction).

Tokenization: the default ``token_pattern`` is the EXPLICIT complement
class ``[^ \\t\\n\\f\\r]+`` — the exact Rust-regex twin of splitting on
RE2's ASCII ``\\s+`` (measured: RE2 ``\\s`` is ``[\\t\\n\\f\\r ]``, NO
``\\v`` and no Unicode spaces, while Rust ``\\S`` would also break on
NBSP/U+2028...), so the ``string_split_regex('\\s+')`` SQL oracle
family matches on ANY input, not just ASCII corpora.
"""

from __future__ import annotations

import re

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

from ..util import hash_mod_column

# THE corpus-wide tokenizer contract (one definition; ml/spans/sketch/
# queries import it): explicit complement class = RE2 \s+ split twin.
# Load-bearing for SQL parity on any input — see the module doc above
# and the CLAUDE.md trap list before touching it.
TOKEN_RE = r"[^ \t\n\f\r]+"

_INDEX_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("bucket", pa.int64()),
        ("postings", pa.list_(pa.int64())),
        ("tfs", pa.list_(pa.int64())),
        ("df", pa.int64()),
    ]
)


def build_inverted_index(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_span: int = 100_000,
    token_pattern: str = TOKEN_RE,
    with_lengths: bool = False,
    ngram: int = 1,
    num_shards: int = 64,
):
    """Dataset of posting rows ``(term, bucket, postings, tfs, df)``
    with ``postings`` sorted ascending within the bucket and ``df`` the
    bucket-LOCAL document frequency (fold with ``term_df`` for global).
    ``bucket_span`` bounds a posting row at ~span doc ids.

    ``with_lengths=True`` additionally emits one doc-length row per
    bucket with ``term`` NULL, ``tfs`` holding each doc's token count
    and ``df`` the bucket's doc count — the norms sidecar ``bm25_topk``
    needs, riding the same fold (each doc lives in exactly one batch,
    so per-batch lengths are final; the NULL-term group per bucket
    merges them).

    ``ngram > 1`` indexes space-joined word n-grams instead of single
    words (the biword index ``phrase_search`` probes); lengths then
    count n-grams, consistently.

    ``num_shards`` sizes the posting fold: the shuffle is keyed by a
    hash shard of ``(term, bucket)`` and each shard folds ALL its
    groups in ONE vectorized polars pass — never one Python call per
    vocabulary x bucket group, which would dominate a realistic
    million-term corpus. Partitioning assumption: one shard's posting
    rows fit one task (raise num_shards with corpus size)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, text_col]))
        toks = (
            df.with_columns(
                pl.col(text_col)
                .fill_null("")
                .str.extract_all(token_pattern)
                .alias("term")
            )
            .drop(text_col)
            .explode("term")
            .drop_nulls("term")
        )
        if ngram > 1:
            # rows of a doc are consecutive and in token order after
            # explode; shifted windows over the doc build the grams and
            # concat_str's null propagation drops the incomplete tail
            parts = [pl.col("term")] + [
                pl.col("term").shift(-i).over(id_col) for i in range(1, ngram)
            ]
            toks = toks.with_columns(
                pl.concat_str(parts, separator=" ").alias("term")
            ).drop_nulls("term")
        out = (
            toks.group_by([id_col, "term"])
            .agg(pl.len().cast(pl.Int64).alias("tf"))
            .with_columns(
                (pl.col(id_col) // bucket_span).cast(pl.Int64).alias("bucket")
            )
            .rename({id_col: "doc"})
        ).select(["term", "bucket", "doc", "tf"])
        if with_lengths:
            lens = (
                toks.group_by(id_col)
                .agg(pl.len().cast(pl.Int64).alias("tf"))
                .with_columns(
                    pl.lit(None, dtype=pl.String).alias("term"),
                    (pl.col(id_col) // bucket_span).cast(pl.Int64).alias("bucket"),
                )
                .rename({id_col: "doc"})
            ).select(["term", "bucket", "doc", "tf"])
            out = pl.concat([out, lens])
        tbl = out.to_arrow().cast(
            pa.schema(
                [
                    ("term", pa.string()),
                    ("bucket", pa.int64()),
                    ("doc", pa.int64()),
                    ("tf", pa.int64()),
                ]
            )
        )
        # NULL term hashes like "" here, which extract_all can never
        # emit, so the lengths sidecar gets its own group per bucket
        return tbl.append_column(
            "__shard", hash_mod_column(tbl, ["term", "bucket"], num_shards)
        )

    def fold_shard(g: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(g)
            .sort("doc")
            .group_by(["term", "bucket"])  # agg preserves within-group row order
            .agg(
                pl.col("doc").alias("postings"),
                pl.col("tf").alias("tfs"),
                pl.len().cast(pl.Int64).alias("df"),
            )
        )
        return out.to_arrow().cast(_INDEX_SCHEMA)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(fold_shard, batch_format="pyarrow")
    )


def refresh_index_buckets(
    index,
    docs,
    changed_ids,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_span: int = 100_000,
    token_pattern: str = TOKEN_RE,
    with_lengths: bool = False,
    ngram: int = 1,
    num_shards: int = 64,
):
    """Incrementally maintain an inverted index from a CDC change set:
    given the PREVIOUS index, the CURRENT corpus and the ids of docs
    that changed (inserted, updated or deleted), rebuild ONLY the
    affected doc-id buckets and splice them into the untouched rows —
    the index analog of the lake's partition repair. Equivalent by
    construction to a full ``build_inverted_index`` over the current
    corpus (pinned by pytest), at the cost of reads proportional to the
    affected buckets, not the corpus.

    Works because every index row is bucket-local (postings, tfs, df
    and the NULL-term length sidecar all derive from docs of ONE
    bucket), so a changed doc invalidates exactly its bucket's rows.
    Deletes need no tombstones: a deleted doc is simply absent from the
    rebuilt bucket. Build flags (span/pattern/lengths/ngram) must match
    the original build — a mismatch would splice differently-tokenized
    rows into one index.

    ``changed_ids`` is an iterable of doc ids (driver-sized: a CDC
    window's keys, not the corpus); the derived affected-bucket set is
    smaller still (ids // span) and ships to tasks as one Arrow array.
    """
    ids = list(changed_ids)
    if not ids:
        return index
    # a NULL changed id is legal: build_inverted_index indexes null-id
    # docs into a NULL bucket, so that whole bucket is refreshed too
    has_null = any(i is None for i in ids)
    buckets = pa.array(
        sorted({i // bucket_span for i in ids if i is not None}), pa.int64()
    )

    def _affected(col) -> pa.Array:
        # explicit null term: pc.is_in yields FALSE (not null) for a
        # NULL input, so fill_null alone would never route null buckets
        hit = pc.is_in(col, value_set=buckets)
        if has_null:
            hit = pc.or_(hit, pc.is_null(col))
        return hit

    def keep_unaffected(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(_affected(batch["bucket"])))

    def in_affected(batch: pa.Table) -> pa.Table:
        from .window import _floor_div  # the shared null-safe floor div

        return batch.filter(_affected(_floor_div(batch[id_col], bucket_span)))

    rebuilt = build_inverted_index(
        docs.map_batches(in_affected, batch_format="pyarrow"),
        id_col,
        text_col,
        bucket_span,
        token_pattern,
        with_lengths,
        ngram,
        num_shards,
    )
    return index.map_batches(keep_unaffected, batch_format="pyarrow").union(
        rebuilt
    )


def term_df(index):
    """Global per-term document frequency as a Dataset ``(term, df)``:
    Sum of the mergeable bucket-local df partials. Stays distributed —
    a 100-TB corpus has a vocabulary far larger than driver memory.
    NULL-term doc-length sidecar rows (``with_lengths=True`` indexes)
    are excluded — they would otherwise surface as a phantom vocabulary
    entry whose df is the corpus doc count."""
    from ray.data.aggregate import Sum

    reals = index.map_batches(
        lambda t: t.filter(pc.is_valid(t["term"])), batch_format="pyarrow"
    )
    return reals.groupby("term").aggregate(Sum("df", alias_name="df"))


def _tf_col(term: str) -> str:
    return "tf_" + re.sub(r"[^0-9A-Za-z_]", "_", term)


def _list_cell(col: pa.ChunkedArray, row: int, dtype) -> np.ndarray:
    """One posting/tf list as numpy WITHOUT the per-element .as_py()
    round-trip: ListScalar.values is the underlying Arrow slice."""
    return np.asarray(col[row].values, dtype=dtype)


def conjunctive_search(
    index, terms: list[str], id_name: str = "doc_id", ids_only: bool = False
):
    """Docs containing ALL ``terms``: ``(id_name, tf_<term>...)`` rows.

    One filter pass over posting rows (only the probe terms survive —
    tiny) + one bucket groupby; per bucket, a sorted ``intersect1d``
    chain narrows to the common docs and gathers each term's tf. Term
    columns keep the input order; duplicate terms are collapsed.

    ``ids_only=True`` returns just ``(id_name,)`` and skips the tf
    gather — phrase_search probes arbitrary bigrams whose sanitized
    tf column names may collide, and never reads the tfs."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("conjunctive_search needs at least one term")
    cols: list[str] = []
    if not ids_only:
        cols = [_tf_col(t) for t in terms]
        if len(set(cols)) != len(cols):
            raise ValueError(f"terms collide after column sanitization: {cols}")
    out_schema = pa.schema(
        [(id_name, pa.int64())] + [(c, pa.int64()) for c in cols]
    )
    tset = pa.array(terms, pa.string())

    def keep(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["term"], value_set=tset))

    def probe(g: pa.Table) -> pa.Table:
        by_term: dict[str, tuple[np.ndarray, np.ndarray | None]] = {}
        for row in range(g.num_rows):
            t = g["term"][row].as_py()
            docs = _list_cell(g["postings"], row, np.int64)
            tfs = None if ids_only else _list_cell(g["tfs"], row, np.int64)
            by_term[t] = (docs, tfs)
        if len(by_term) < len(terms):
            return out_schema.empty_table()
        common, tfs0 = by_term[terms[0]]
        gathered = [] if ids_only else [tfs0]
        for t in terms[1:]:
            docs, tfs = by_term[t]
            common, ia, ib = np.intersect1d(
                common, docs, assume_unique=True, return_indices=True
            )
            gathered = [arr[ia] for arr in gathered]
            if not ids_only:
                gathered.append(tfs[ib])
        if not len(common):
            return out_schema.empty_table()
        return pa.table(
            {id_name: common, **dict(zip(cols, gathered))}, schema=out_schema
        )

    import ray.data

    out = (
        index.map_batches(keep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(probe, batch_format="pyarrow")
    )
    # a no-hit probe leaves a zero-block Dataset with NO schema; one
    # typed empty block keeps downstream selects/sorts schema-stable
    return out.union(ray.data.from_arrow(out_schema.empty_table()))


def phrase_search(
    ds,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_span: int = 100_000,
    token_pattern: str = TOKEN_RE,
    broadcast_limit_bytes: int = 64 << 20,
):
    """Exact phrase match: Dataset of ``(id_col,)`` for docs whose
    token stream contains the phrase's words CONSECUTIVELY.

    Biword plan: a bigram (word-pair) index narrows to docs containing
    every phrase bigram — already exact for 1-2 word phrases; longer
    phrases get one vectorized verify pass over the candidates' own
    token streams (bigram conjunction admits 'a b ... b c' without
    'a b c'). The candidate handoff is size-routed like
    dedup.candidate_doc_ids: a sorted-id broadcast filter under the
    byte budget, a bucket hash join above it — never an unguarded
    driver materialization of a hot phrase's candidate set."""
    from ..ops.join import bucket_hash_join, semi_anti_filter

    # tokenize the phrase with the SAME pattern as the corpus —
    # str.split() breaks on Unicode whitespace the index keeps inside
    # tokens, silently missing docs that contain the literal phrase.
    # group(0), not findall: findall returns capture-GROUP contents
    # when the caller's pattern has one, diverging from extract_all
    words = [m.group(0) for m in re.finditer(token_pattern, phrase)]
    if not words:
        raise ValueError("phrase_search needs at least one word")
    docs = ds.map_batches(
        lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
    )
    if len(words) == 1:
        idx = build_inverted_index(
            docs, id_col, text_col, bucket_span, token_pattern
        )
        cand = conjunctive_search(idx, words, id_name=id_col, ids_only=True)
    else:
        idx = build_inverted_index(
            docs, id_col, text_col, bucket_span, token_pattern, ngram=2
        )
        bigrams = [" ".join(words[i : i + 2]) for i in range(len(words) - 1)]
        cand = conjunctive_search(idx, bigrams, id_name=id_col, ids_only=True)
    if len(words) <= 2:
        return cand
    # two consumers below (count + filter/join) — without this pin the
    # whole tokenize+shuffle chain would re-execute for each; bounded by
    # docs containing every phrase bigram, spillable
    cand = cand.materialize()

    needle = " " + " ".join(words) + " "

    def verify(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, text_col]))
        keep = df.filter(
            (
                " "
                + pl.col(text_col)
                .fill_null("")
                .str.extract_all(token_pattern)
                .list.join(" ")
                + " "
            ).str.contains(needle, literal=True)
        )
        return keep.select([id_col]).to_arrow().cast(
            pa.schema([batch.schema.field(id_col)])
        )

    n_cand = cand.count()
    if n_cand * 16 <= broadcast_limit_bytes:
        ids = pa.array(sorted(cand.unique(id_col)), pa.int64())
        matched = semi_anti_filter(docs, ids, id_col)
    else:
        matched = bucket_hash_join(docs, cand, id_col, id_col, how="inner")
    return matched.map_batches(verify, batch_format="pyarrow")


def bm25_topk(
    index,
    terms: list[str],
    k: int = 50,
    k1: float = 1.2,
    b: float = 0.75,
    id_name: str = "doc_id",
) -> pa.Table:
    """Disjunctive BM25 top-k over an index built ``with_lengths=True``:
    ``(rank, doc_id, score)`` for the k best docs matching >=1 term.

    Shape: the index is materialized once (three consumers — corpus
    stats, per-term df, scoring — would otherwise re-tokenize the whole
    corpus per pass); stats and df folds move one tiny row per bucket /
    term; scoring filters posting rows to the probe terms + the NULL
    length rows and runs per-bucket (distributed, bounded), keeping a
    k-row partial per bucket so the driver fold sees <= k * n_buckets
    rows — the knn top-k pattern.

    Score parity: Lucene-style idf = ln(1 + (N - df + .5)/(df + .5))
    (never negative), computed ONCE per term with math.log; the
    doc-side factor is pure rational float64 arithmetic whose
    expression tree matches SQL_BM25 token for token, and per-term
    contributions are added left-to-right in query order with 0.0 for
    non-matches (= the oracle's coalesce chain) — IEEE-correctly-
    rounded ops make the scores bit-identical to DuckDB's, so the
    driver may hash the float column."""
    import math

    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("bm25_topk needs at least one term")
    tset = pa.array(terms, pa.string())
    idx = index.materialize()

    def bucket_stats(batch: pa.Table) -> pa.Table:
        lens = batch.filter(pc.is_null(batch["term"]))
        n = pc.sum(lens["df"]).as_py() or 0
        tok = pc.sum(pc.list_flatten(lens["tfs"])).as_py() or 0
        return pa.table({"n": pa.array([n], pa.int64()), "tok": pa.array([tok], pa.int64())})

    stats = idx.map_batches(bucket_stats, batch_format="pyarrow").take_all()
    n_docs = sum(r["n"] for r in stats)
    tot_tokens = sum(r["tok"] for r in stats)
    if n_docs == 0:
        raise ValueError("bm25_topk: index has no length rows — build with with_lengths=True")
    avg = tot_tokens / n_docs

    from ray.data.aggregate import Sum

    df_rows = idx.map_batches(
        lambda t: t.filter(pc.is_in(t["term"], value_set=tset)).select(
            ["term", "df"]
        ),
        batch_format="pyarrow",
    )
    dfs = {
        r["term"]: r["df"]
        for r in df_rows.groupby("term").aggregate(Sum("df", alias_name="df")).take_all()
    }
    idfs = [
        math.log(1.0 + (n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5))
        for t in terms
    ]

    part_schema = pa.schema([(id_name, pa.int64()), ("score", pa.float64())])

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.or_kleene(
            pc.is_in(batch["term"], value_set=tset), pc.is_null(batch["term"])
        )
        return batch.filter(pc.fill_null(m, False))

    def score_bucket(g: pa.Table) -> pa.Table:
        docs = dls = None
        post: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for row in range(g.num_rows):
            t = g["term"][row].as_py()
            p = _list_cell(g["postings"], row, np.int64)
            f = _list_cell(g["tfs"], row, np.float64)
            if t is None:
                docs, dls = p, f
            else:
                post[t] = (p, f)
        if docs is None or not post:
            return part_schema.empty_table()
        n = len(docs)
        norm = k1 * ((1.0 - b) + (b * dls) / avg)
        score = np.zeros(n)
        matched = np.zeros(n, bool)
        for t, idf in zip(terms, idfs):
            c = np.zeros(n)
            if t in post:
                p, f = post[t]
                pos = np.searchsorted(docs, p)
                c[pos] = idf * ((f * (k1 + 1.0)) / (f + norm[pos]))
                matched[pos] = True
            score = score + c
        sel = np.flatnonzero(matched)
        if not len(sel):
            return part_schema.empty_table()
        order = sel[np.lexsort((docs[sel], -score[sel]))][:k]
        return pa.table(
            {id_name: docs[order], "score": score[order]}, schema=part_schema
        )

    partials = (
        idx.map_batches(keep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(score_bucket, batch_format="pyarrow")
        .take_all()
    )
    top = (
        pl.from_arrow(pa.Table.from_pylist(partials, schema=part_schema))
        .sort(["score", id_name], descending=[True, False], nulls_last=True)
        .head(k)
        .with_row_index("rank", offset=1)
        .select(["rank", id_name, "score"])
    )
    return top.to_arrow().cast(
        pa.schema(
            [("rank", pa.int64()), (id_name, pa.int64()), ("score", pa.float64())]
        )
    )
