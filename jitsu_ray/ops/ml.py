"""Hashing-trick linear text classification — the batched-model-
inference shape for corpus filtering (the public fastText / Vowpal
Wabbit "hashing trick", Weinberger et al. ICML 2009): a feature is a
token's hash bucket ``md5_lower64(token) % dim``, the model is a dense
weight vector + bias, and a document's score is the sum of its token
occurrences' bucket weights. This is how quality/toxicity filters run
over a 100-TB corpus: the model is fixed, scoring is embarrassingly
parallel, and the only state is the weight vector.

Two deliberate contracts:

- **INTEGER weights** (e.g. a learned float model quantized to int —
  standard for serving): integer sums are associative in any order, so
  the score is bit-exact reproducible in DuckDB via the md5 SQL twin
  (``md5_number_lower(t) % dim``) — the classifier gets a fully green
  oracle instead of a float-tolerance check.
- **Broadcast once, never per batch**: the weight vector goes to the
  object store ONCE (``ray.put``) and each worker process fetches it
  once (``util.once_per_process``) — the ray_guide broadcast pattern;
  a model too big to broadcast would swap this for an actor-pool class
  fetching shards in ``__init__`` (the ops/multimodal shape).

Scoring is vectorized end-to-end: one polars tokenize/explode/count
pass per batch, md5 over BATCH-UNIQUE tokens only (the round-3-verdict
rule for the md5-parity hash), numpy weight gather, one group-by sum.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

# the corpus-wide tokenizer contract lives in ops/search (ONE definition)
from .search import TOKEN_RE as _TOKEN_RE


def rule_weights(dim: int) -> np.ndarray:
    """The documented stand-in for a learned model: w[b] = (b % 7) - 3,
    int64. Exercises every code path a real quantized model would
    (positive/negative/zero weights) while staying derivable inside the
    SQL oracle — a learned vector would ship the same way and score
    just as exactly."""
    return (np.arange(dim, dtype=np.int64) % 7) - 3


def score_text_hashed(
    ds,
    weights_ref,
    *,
    dim: int,
    bias: int = 0,
    threshold: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Score every ROW with a hashed-bag-of-words linear model and
    label it ``keep = score >= threshold``. Returns a Dataset of
    (id_col, score, keep) — one row per input row in input order,
    null/empty text scores ``bias``. Scores are computed from each
    row's own text (keyed by batch row POSITION, never by id), so the
    result is independent of partitioning and block layout; rows that
    share an id get their own per-row scores. ``weights_ref`` is a
    ``ray.put`` handle to an int64 vector of length ``dim`` (broadcast
    once per process, never re-shipped per batch)."""

    def run(batch: pa.Table, _wref=weights_ref) -> pa.Table:
        from ..util import md5_lower64, once_per_process

        w = once_per_process("hashed_linear_weights", _wref)
        df = pl.from_arrow(batch.select([id_col, text_col])).with_row_index("__row")
        # per-(row, token) occurrence counts — one explode+count pass
        counts = (
            df.select(
                pl.col("__row"),
                pl.col(text_col).fill_null("").str.extract_all(_TOKEN_RE).alias("__t"),
            )
            .explode("__t")
            .drop_nulls("__t")  # empty-text rows explode to a null token
            .group_by(["__row", "__t"])
            .agg(pl.len().cast(pl.Int64).alias("__n"))
        )
        # md5 over batch-unique tokens only; weight per unique token,
        # gathered back via a join on the token itself
        uniq = counts["__t"].unique(maintain_order=True)
        toks = uniq.to_list()
        buckets = np.fromiter(
            (md5_lower64(t) % dim for t in toks), dtype=np.int64, count=len(toks)
        )
        wmap = pl.DataFrame({"__t": uniq, "__w": pl.Series(w[buckets], dtype=pl.Int64)})
        scored = (
            counts.join(wmap, on="__t", how="left")
            .group_by("__row")
            .agg((pl.col("__w") * pl.col("__n")).sum().cast(pl.Int64).alias("__s"))
        )
        # every input row gets a score row (token-less rows score bias);
        # maintain_order pins output to input row order (polars joins
        # do NOT guarantee it — measured round-4 trap)
        out = (
            df.select(pl.col("__row"), pl.col(id_col))
            .join(scored, on="__row", how="left", maintain_order="left")
            .with_columns(
                (pl.col("__s").fill_null(0) + bias).alias("score"),
            )
            .with_columns((pl.col("score") >= threshold).alias("keep"))
            .drop(["__row", "__s"])
        )
        return out.to_arrow()

    return ds.map_batches(run, batch_format="pyarrow")
