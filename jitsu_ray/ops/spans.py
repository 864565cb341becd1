"""Exact duplicate-SPAN dedup (SURVEY §2.11): substring-level exact
dedup in the style of Lee et al., "Deduplicating Training Data Makes
Language Models Better" (ACL 2022) — instead of dropping whole
near-duplicate documents (ops/dedup.py), find every word n-gram that
occurs more than once ANYWHERE in the corpus and mark all occurrences
except the globally first, so repeated boilerplate inside otherwise
unique documents can be removed. The reference engine has no analog;
this is a training-data-pipeline operator.

Ray-Data-first shape, two shuffles, no driver state:

1. gram pass — per-batch polars tokenize + positional n-grams (the
   shifted concat_str trick from ops/search.build_inverted_index),
   COMBINED per batch to one row per distinct gram with its (doc, pos)
   occurrence lists, so a batch's repeated boilerplate ships its gram
   string once; shuffle keyed ``hash(gram) % num_shards``; one
   vectorized polars pass per shard marks every occurrence after the
   global first (``ORDER BY doc, pos``) as a duplicate span start.
2. doc pass — duplicate span starts union'd with the corpus token
   stream, shuffled ONCE by ``hash(doc) % num_shards``; per shard one
   polars pass expands starts to covered positions (int_ranges +
   explode + unique), left-joins coverage onto tokens, and folds per
   doc: token count, covered-token count, and the md5 of the KEPT
   (uncovered) token stream — i.e. the document after span removal.

Scale notes: the gram shuffle is the honest cost of exact span dedup —
bytes ~ distinct-grams-per-batch x gram length (the per-batch combiner
is what keeps hot boilerplate from amplifying n-fold).
``fingerprint=True`` is the 100-TB path: the group key becomes two
independently seeded vectorized xxhash64 columns (128 bits — collision
odds ~q^2/2^129 for q distinct grams, negligible at any corpus size)
computed per batch, cutting shuffle bytes ~(n x token)/16 per
occurrence; the default stays the gram string because it is
collision-FREE and lets a DuckDB oracle reproduce the grouping exactly
(pytest pins the two modes equal). Skew: a pathologically hot gram
(empty-page boilerplate) lands one row PER BATCH in one shard —
bounded by batch count, not corpus size.

Oracle parity (queries.SQL_DEDUP_SPANS): tokenization is the measured
RE2-parity pair — explicit class ``[^ \\t\\n\\f\\r]+`` on this side,
``trim(x, ' ')`` + ``string_split_regex('\\s+')`` + ``<> ''`` filter in
SQL (bare ``trim()`` is Unicode-aware; see ops/search.py). Positions
are 1-based to match ``generate_series``; "first" = smallest
``(doc, pos)``; all-covered docs get a NULL cleaned_md5 exactly like
``md5(string_agg(...) FILTER ...)`` over zero kept rows.
"""

from __future__ import annotations

import hashlib

import polars as pl
import pyarrow as pa

from ..util import hash_mod_column
from .search import TOKEN_RE

_OUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("n_tokens", pa.int64()),
        ("n_dup_tokens", pa.int64()),
        ("cleaned_md5", pa.string()),
    ]
)

_TEXT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("cleaned_text", pa.string())]
)


def duplicate_span_stats(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    token_pattern: str = TOKEN_RE,
    num_shards: int = 64,
    fingerprint: bool = False,
    emit: str = "stats",
):
    """Per-document duplicate-span accounting: Dataset ``(doc_id,
    n_tokens, n_dup_tokens, cleaned_md5)``, one row per document with
    >= 1 token. ``n_dup_tokens`` counts token positions covered by at
    least one duplicated n-gram occurrence (all occurrences of a gram
    except the corpus-wide first, ordered by (doc, pos)); ``cleaned_md5``
    is the md5 of the uncovered tokens re-joined with single spaces —
    the document after span removal — or NULL when every token is
    covered. Documents shorter than ``n`` tokens contribute no grams
    but still appear (their spans can never duplicate). PRECONDITION:
    one row per document with a unique non-null ``id_col`` — duplicate
    (or multiple NULL) ids in one batch would concatenate their token
    streams (``over(doc)`` groups them), producing phantom
    boundary-spanning grams; see ops/decontam._row_grams for the
    row-scoped alternative.

    ``emit="text"`` returns the cleaned CORPUS instead — ``(doc_id,
    cleaned_text)`` with the uncovered tokens space-rejoined (NULL when
    every token was covered): the output a training-data pipeline
    actually feeds forward, same fold, no md5."""
    if n < 1:
        raise ValueError("duplicate_span_stats needs n >= 1")
    if emit not in ("stats", "text"):
        raise ValueError("emit must be 'stats' or 'text'")

    def _tokens(batch: pa.Table) -> pl.DataFrame:
        return (
            pl.from_arrow(batch.select([id_col, text_col]))
            .with_columns(
                pl.col(text_col)
                .fill_null("")
                .str.extract_all(token_pattern)
                .alias("tok")
            )
            .drop(text_col)
            .explode("tok")
            .drop_nulls("tok")  # zero-token docs explode to null rows
            .with_columns(
                pl.col("tok").cum_count().over(id_col).alias("pos")  # 1-based
            )
            .rename({id_col: "doc"})
        )

    # fingerprint mode replaces the gram STRING with two independently
    # seeded xxhash64 columns (128 bits total — collision-free at any
    # realistic corpus size), computed per batch and shipped INSTEAD of
    # the string: shuffle bytes drop ~(n x avg token)/16 per occurrence
    key_cols = ["h1", "h2"] if fingerprint else ["g"]
    key_fields = (
        [("h1", pa.int64()), ("h2", pa.int64())]
        if fingerprint
        else [("g", pa.string())]
    )
    gram_schema = pa.schema(
        key_fields + [("docs", pa.list_(pa.int64())), ("poss", pa.list_(pa.int64()))]
    )

    def gram_partial(batch: pa.Table) -> pa.Table:
        toks = _tokens(batch)
        parts = [pl.col("tok")] + [
            pl.col("tok").shift(-i).over("doc") for i in range(1, n)
        ]
        grams = toks.with_columns(
            pl.concat_str(parts, separator=" ").alias("g")
        ).drop_nulls("g")  # concat_str null-propagates past doc end
        if fingerprint:
            grams = grams.with_columns(
                pl.col("g").hash(seed=0x51ed).reinterpret(signed=True).alias("h1"),
                pl.col("g").hash(seed=0xfee1).reinterpret(signed=True).alias("h2"),
            )
        grams = grams.group_by(key_cols).agg(  # batch combiner: key ships once
            pl.col("doc").alias("docs"),
            pl.col("pos").cast(pl.Int64).alias("poss"),
        )
        tbl = grams.to_arrow().cast(gram_schema)
        return tbl.append_column(
            "__shard", hash_mod_column(tbl, key_cols, num_shards)
        )

    def mark_shard(g: pa.Table) -> pa.Table:
        occ = (
            pl.from_arrow(g)
            .explode(["docs", "poss"])
            .rename({"docs": "doc", "poss": "pos"})
            .sort([*key_cols, "doc", "pos"])
            .with_columns(pl.col("doc").cum_count().over(key_cols).alias("__rn"))
            .filter(pl.col("__rn") > 1)  # all but the corpus-wide first
            .select(["doc", "pos"])
        )
        return occ.to_arrow().cast(
            pa.schema([("doc", pa.int64()), ("pos", pa.int64())])
        )

    dup_starts = (
        ds.map_batches(gram_partial, batch_format="pyarrow")
        .groupby("__shard")
        .map_groups(mark_shard, batch_format="pyarrow")
    )

    row_schema = pa.schema(
        [("doc", pa.int64()), ("pos", pa.int64()), ("tok", pa.string())]
    )

    def token_rows(batch: pa.Table) -> pa.Table:
        tbl = (
            _tokens(batch)
            .select(["doc", pl.col("pos").cast(pl.Int64), "tok"])
            .to_arrow()
            .cast(row_schema)
        )
        return tbl.append_column(
            "__shard", hash_mod_column(tbl, ["doc"], num_shards)
        )

    def start_rows(batch: pa.Table) -> pa.Table:
        tbl = batch.append_column(
            "tok", pa.nulls(batch.num_rows, pa.string())
        ).cast(row_schema)
        return tbl.append_column(
            "__shard", hash_mod_column(tbl, ["doc"], num_shards)
        )

    def fold_shard(g: pa.Table) -> pa.Table:
        df = pl.from_arrow(g)
        toks = df.filter(pl.col("tok").is_not_null()).sort(["doc", "pos"])
        cov = (
            df.filter(pl.col("tok").is_null())
            .select(
                "doc",
                pl.int_ranges(pl.col("pos"), pl.col("pos") + n).alias("pos"),
            )
            .explode("pos")
            .unique()
            .with_columns(pl.lit(True).alias("__cov"))
        )
        per_doc = (
            # maintain_order: kept-token order (hence the md5) must be
            # the (doc, pos) sort above — polars joins otherwise do NOT
            # guarantee left order across versions/parallel paths
            toks.join(cov, on=["doc", "pos"], how="left", maintain_order="left")
            .with_columns(pl.col("__cov").fill_null(False))
            .group_by("doc", maintain_order=True)
            .agg(
                pl.len().cast(pl.Int64).alias("n_tokens"),
                pl.col("__cov").sum().cast(pl.Int64).alias("n_dup_tokens"),
                pl.col("tok").filter(~pl.col("__cov")).str.join(" ").alias("__kept"),
                (pl.len() - pl.col("__cov").sum()).alias("__n_kept"),
            )
        )
        if emit == "text":
            out = per_doc.select(
                pl.col("doc").alias("doc_id"),
                pl.when(pl.col("__n_kept") > 0)
                .then(pl.col("__kept"))
                .alias("cleaned_text"),  # all-covered doc -> NULL, not ""
            )
            return out.to_arrow().cast(_TEXT_SCHEMA)
        kept = per_doc["__kept"].to_list()
        n_kept = per_doc["__n_kept"].to_list()
        md5s = [
            hashlib.md5(s.encode()).hexdigest() if k > 0 else None
            for s, k in zip(kept, n_kept)
        ]
        return pa.table(
            {
                "doc_id": per_doc["doc"].to_arrow(),
                "n_tokens": per_doc["n_tokens"].to_arrow(),
                "n_dup_tokens": per_doc["n_dup_tokens"].to_arrow(),
                "cleaned_md5": pa.array(md5s, pa.string()),
            },
            schema=_OUT_SCHEMA,
        )

    rows = ds.map_batches(token_rows, batch_format="pyarrow").union(
        dup_starts.map_batches(start_rows, batch_format="pyarrow")
    )
    return rows.groupby("__shard").map_groups(fold_shard, batch_format="pyarrow")

