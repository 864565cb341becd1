"""Distributed inverted index + conjunctive term search (SURVEY §2.11).

The reference routes and filters events but has no content search; a
training-data pipeline needs one (corpus audits, targeted extraction,
contamination spot-checks). Ray-Data-first design:

- ``build_inverted_index``: one tokenizing combiner pass (per-batch
  polars explode + tf count — each document lives in exactly one input
  row, so per-batch tf counts are already FINAL, no re-aggregation) and
  ONE shuffle keyed ``(term, bucket)`` where ``bucket = doc_id //
  bucket_span``. Postings are many bounded rows per term, never one
  giant list — a stopword's postings spread across buckets, so no
  single task ever holds a hot term's full docs list (the 100-TB
  failure mode of term-keyed indexes).
- ``conjunctive_search``: filter the index rows to the probe terms
  (tiny), one ``groupby(bucket)`` co-locates each bucket's posting rows
  for all terms, and a vectorized ``np.intersect1d`` chain inside
  ``map_groups`` ANDs them — intersection work is distributed per
  bucket and bounded by the smallest posting list.
- ``term_df``: global document frequency = a Sum fold of the bucket-
  local ``df`` column (mergeable by construction).

Tokenization matches q_vocab_top20's ``\\S+`` extraction so one SQL
oracle family (``string_split_regex('\\s+')``) covers both; the Rust-
regex-vs-RE2 Unicode-whitespace caveat documented there applies here
too (identical on ASCII corpora).
"""

from __future__ import annotations

import re

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc

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
    token_pattern: str = r"\S+",
):
    """Dataset of posting rows ``(term, bucket, postings, tfs, df)``
    with ``postings`` sorted ascending within the bucket and ``df`` the
    bucket-LOCAL document frequency (fold with ``term_df`` for global).
    ``bucket_span`` bounds a posting row at ~span doc ids."""

    def partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([id_col, text_col]))
        out = (
            df.with_columns(
                pl.col(text_col)
                .fill_null("")
                .str.extract_all(token_pattern)
                .alias("term")
            )
            .drop(text_col)
            .explode("term")
            .drop_nulls("term")
            .group_by([id_col, "term"])
            .agg(pl.len().cast(pl.Int64).alias("tf"))
            .with_columns(
                (pl.col(id_col) // bucket_span).cast(pl.Int64).alias("bucket")
            )
            .rename({id_col: "doc"})
        )
        return out.select(["term", "bucket", "doc", "tf"]).to_arrow().cast(
            pa.schema(
                [
                    ("term", pa.string()),
                    ("bucket", pa.int64()),
                    ("doc", pa.int64()),
                    ("tf", pa.int64()),
                ]
            )
        )

    def fold(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g).sort("doc")
        return pa.table(
            {
                "term": [df["term"][0]],
                "bucket": [df["bucket"][0]],
                "postings": [df["doc"].to_list()],
                "tfs": [df["tf"].to_list()],
                "df": [df.height],
            },
            schema=_INDEX_SCHEMA,
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["term", "bucket"])
        .map_groups(fold, batch_format="pyarrow")
    )


def term_df(index):
    """Global per-term document frequency as a Dataset ``(term, df)``:
    Sum of the mergeable bucket-local df partials. Stays distributed —
    a 100-TB corpus has a vocabulary far larger than driver memory."""
    from ray.data.aggregate import Sum

    return index.groupby("term").aggregate(Sum("df", alias_name="df"))


def _tf_col(term: str) -> str:
    return "tf_" + re.sub(r"[^0-9A-Za-z_]", "_", term)


def conjunctive_search(index, terms: list[str], id_name: str = "doc_id"):
    """Docs containing ALL ``terms``: ``(id_name, tf_<term>...)`` rows.

    One filter pass over posting rows (only the probe terms survive —
    tiny) + one bucket groupby; per bucket, a sorted ``intersect1d``
    chain narrows to the common docs and gathers each term's tf. Term
    columns keep the input order; duplicate terms are collapsed."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("conjunctive_search needs at least one term")
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
        by_term: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for row in range(g.num_rows):
            t = g["term"][row].as_py()
            docs = np.asarray(g["postings"][row].as_py(), np.int64)
            tfs = np.asarray(g["tfs"][row].as_py(), np.int64)
            by_term[t] = (docs, tfs)
        if len(by_term) < len(terms):
            return out_schema.empty_table()
        common, gathered = by_term[terms[0]]
        gathered = [gathered]
        for t in terms[1:]:
            docs, tfs = by_term[t]
            common, ia, ib = np.intersect1d(
                common, docs, assume_unique=True, return_indices=True
            )
            gathered = [arr[ia] for arr in gathered]
            gathered.append(tfs[ib])
        if not len(common):
            return out_schema.empty_table()
        return pa.table(
            {id_name: common, **dict(zip(cols, gathered))}, schema=out_schema
        )

    return (
        index.map_batches(keep, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(probe, batch_format="pyarrow")
    )
