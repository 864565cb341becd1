"""Benchmark decontamination — flag/drop training documents that
overlap a held-out evaluation set (the standard pre-training hygiene
step: eval snippets must not leak into the corpus).

Two modes, auto-routed by benchmark size:

- SUBSTRING (exact, the oracle default): a doc is contaminated iff any
  benchmark snippet occurs verbatim in its text. Snippets broadcast
  once via ``ray.put``; each batch runs one vectorized
  ``pyarrow.compute.match_substring`` pass per snippet and ORs the
  masks — k snippets cost k C-speed scans of the batch, which is the
  right trade while the benchmark is small (real eval sets are: a few
  thousand fixed strings vs a 100-TB corpus).
- WORD-N-GRAM (the scale path): contamination = sharing >= ``min_hits``
  word n-grams with the benchmark (the Lee et al. / GPT-3-style
  definition, which also catches lightly-edited leaks that substring
  misses). Benchmark n-gram hashes are computed once; docs hash every
  n-gram with a vectorized rolling Horner pass over per-word md5
  hashes and probe membership via ``searchsorted`` against the
  broadcast sorted hash array — above a byte budget the probe is
  Bloom-prefiltered (ops/sketch.BloomFilter) with the exact array
  fetched lazily only by workers that see positives. Membership is by
  64-bit hash: a false flag needs an md5-lower64 collision between a
  doc n-gram and a bench n-gram (~(n_doc_ngrams * n_bench)/2^64 —
  negligible and standard for n-gram decontamination), so this mode is
  pytest-checked against a brute-force set intersection, while the
  substring mode carries the SQL oracle.

No reference analog (the reference ingests events, not corpora); this
is an LLM-suite operator per the build brief.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

import polars as pl

from ..util import md5_lower64
from .search import TOKEN_RE

# Horner multiplier for combining word hashes into an n-gram hash
# (odd => invertible mod 2^64, so windows differing in any word differ)
_NGRAM_C = np.uint64(0x100000001B3)  # FNV-1a 64 prime — public constant


def _word_hashes(texts: list[str | None]) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize (whitespace split) and md5-lower64-hash every word of
    every text. Returns (flat uint64 word-hash array, int64 doc index
    per word). Hashing runs once per UNIQUE word (md5_lower64 caches),
    so cost tracks vocabulary, not corpus length."""
    words: list[str] = []
    doc_idx: list[int] = []
    for i, t in enumerate(texts):
        if not t:
            continue
        ws = t.split()
        words.extend(ws)
        doc_idx.extend([i] * len(ws))
    if not words:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    uniq, inv = np.unique(np.asarray(words, dtype=object), return_inverse=True)
    uh = np.fromiter(
        (md5_lower64(w) for w in uniq), dtype=np.uint64, count=len(uniq)
    )
    return uh[inv], np.asarray(doc_idx, dtype=np.int64)


def ngram_hashes(texts: list[str | None], n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word-n-gram hashes across ``texts`` (windows never cross a
    doc boundary). Returns (uint64 hashes, doc index per hash). The
    rolling combine is n vectorized Horner passes over the flat
    word-hash array — no per-window Python."""
    wh, di = _word_hashes(texts)
    L = len(wh) - n + 1
    if L <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    h = np.zeros(L, dtype=np.uint64)
    for j in range(n):
        h = h * _NGRAM_C + wh[j : j + L]
    valid = di[:L] == di[n - 1 :]  # window stays inside one doc
    return h[valid], di[:L][valid]


def decontaminate_substring(ds, text_col: str, snippets: list[str],
                            out_col: str = "contaminated"):
    """Append ``out_col`` (bool): does any benchmark snippet occur
    verbatim in ``text_col``? Empty/None snippets are dropped (DuckDB's
    ``contains(x, '')`` is vacuously true and never what a benchmark
    means). Snippets ship once per node via ``ray.put``."""
    from ..util import once_per_process

    snips = [s for s in snippets if s]
    ref = ray.put(snips)

    def flag(batch: pa.Table) -> pa.Table:
        sn = once_per_process("decontam.snippets", ref)
        col = batch[text_col]
        mask = np.zeros(len(batch), dtype=bool)
        for s in sn:
            m = pc.fill_null(pc.match_substring(col, s), False)  # NULL text
            mask |= m.to_numpy(zero_copy_only=False)  # never contaminated
        return batch.append_column(out_col, pa.array(mask))

    return ds.map_batches(flag, batch_format="pyarrow")


def decontaminate_ngram(ds, text_col: str, bench_texts: list[str | None],
                        n: int = 8, min_hits: int = 1,
                        out_col: str = "contaminated",
                        broadcast_limit_bytes: int = 64 << 20):
    """Append ``out_col`` (bool): does the doc share >= ``min_hits``
    word n-grams with the benchmark? Under the broadcast budget the
    sorted bench-hash array ships to every worker and each batch is one
    ``searchsorted`` probe; above it, a Bloom prefilter (bits ~10/key)
    ships instead and the exact array ref is fetched lazily only by
    batches with Bloom positives — the ops/sketch semi-filter shape,
    still exact modulo 64-bit hash collisions."""
    from ..util import once_per_process

    bh, _ = ngram_hashes(bench_texts, n)
    bench = np.unique(bh)
    exact_ref = ray.put(bench)
    bloom_ref = None
    if bench.nbytes > broadcast_limit_bytes:
        from .sketch import BloomFilter

        bloom_ref = ray.put(BloomFilter.build(bench.view(np.int64)))

    def flag(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        h, di = ngram_hashes(texts, n)
        hits_per_doc = np.zeros(len(batch), dtype=np.int64)
        if len(h):
            # hits count DISTINCT shared n-grams (the set-intersection
            # definition): dedupe (doc, gram-hash) pairs first, else a
            # doc repeating one leaked gram min_hits times self-flags
            order = np.lexsort((h, di))
            d_s, h_s = di[order], h[order]
            first = np.ones(len(d_s), dtype=bool)
            first[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
            h, di = h_s[first], d_s[first]
            if bloom_ref is not None:
                bf = once_per_process("decontam.bloom", bloom_ref)
                cand = bf.contains_many(h.view(np.int64))
                h, di = h[cand], di[cand]
            if len(h):
                b = once_per_process("decontam.bench", exact_ref)
                if len(b):
                    pos = np.searchsorted(b, h)
                    pos[pos == len(b)] = 0
                    hit = b[pos] == h
                    np.add.at(hits_per_doc, di[hit], 1)
        return batch.append_column(
            out_col, pa.array(hits_per_doc >= min_hits)
        )

    return ds.map_batches(flag, batch_format="pyarrow")


def decontaminate_auto(ds, text_col: str, bench_texts: list[str | None],
                       out_col: str = "contaminated",
                       substring_limit: int = 4096, n: int = 8):
    """Route by benchmark size (the embedding_near_dup_auto shape): at
    or under ``substring_limit`` snippets -> exact substring scan (the
    oracle semantics, k vectorized passes per batch); above it the
    per-snippet scan cost k*bytes is the bottleneck, so -> n-gram hash
    membership (one probe pass regardless of benchmark size)."""
    snips = [s for s in bench_texts if s]
    if len(snips) <= substring_limit:
        return decontaminate_substring(ds, text_col, snips, out_col)
    return decontaminate_ngram(ds, text_col, snips, n=n, out_col=out_col)


def decontaminate_exact_ngram(
    train_ds,
    eval_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    token_pattern: str = TOKEN_RE,
    max_broadcast_bytes: int = 64 << 20,
    eval_text_col: str | None = None,
    out_col: str = "contaminated",
    count_col: str = "n_matched",
):
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM eval-
    overlap rule): flag every training document sharing at least one
    word n-gram with the evaluation/benchmark corpus, so leaked test
    data can be dropped before training. APPENDS ``contaminated`` and
    ``n_matched`` (DISTINCT matched grams; docs shorter than ``n``
    tokens can never match) to every train row — composable in place,
    select the columns you need downstream (``id_col`` is kept in the
    signature for caller stability; every input column, id included,
    passes through untouched). ``eval_text_col`` names the benchmark
    side's text column when it differs (e.g. probing CLEANED train
    text against a raw benchmark). Stacked passes (two benchmarks, two
    gram orders) rename their verdicts via ``out_col``/``count_col``;
    a name already present in the input raises instead of silently
    duplicating the column (sibling ``strip_repeated_lines`` rule).

    Distributed shape: eval sets are small by nature (benchmarks are
    thousands of documents, not corpora), so the eval gram set is
    folded driver-side from per-batch DISTINCT partials and broadcast
    ONCE via ray.put under a ``max_broadcast_bytes`` guard — the train
    corpus then streams through a single map_batches probe (polars
    ``is_in`` hash probe, no shuffle at all). Above the guard, raise
    with guidance: a >64 MiB benchmark gram set should go through the
    partitioned semi-join path (``ops/join.bucket_hash_join`` over the
    gram stream) instead of a per-task ship.

    Role in this family: decontaminate_ngram above is the hash-probe
    scale mode (pytest-checked, 64-bit collisions tolerated, benchmark
    as a driver-side list); THIS is the exact-gram-string mode — eval
    set streamed as a Dataset, collision-FREE, with a full SQL oracle
    twin (the SQL_DEDUP_SPANS ``array_to_string(words[i : i+n-1])``
    gram pattern + semi join) and DISTINCT matched-gram counts per doc.
    Tokenization is the RE2-parity class shared with
    ops/spans.duplicate_span_stats."""
    import ray

    from ..util import once_per_process

    if n < 1:
        raise ValueError("decontaminate needs n >= 1")
    if out_col == count_col:
        raise ValueError(f"out_col and count_col are both {out_col!r}")
    if text_col in (out_col, count_col) or id_col in (out_col, count_col):
        raise ValueError(
            f"out_col/count_col ({out_col!r}/{count_col!r}) shadow an "
            f"input column — rename the verdict columns"
        )

    ev_text = eval_text_col or text_col

    def _row_grams(df: pl.DataFrame, col: str) -> pl.DataFrame:
        """(__r, <col>) -> (__r, g). Grams are ROW-scoped — the shift
        window partitions on the row index, NOT the id column, so
        duplicate or NULL doc ids can never concatenate two rows' token
        streams into phantom boundary-spanning grams (review-found
        bleed; polars ``over`` groups all NULL keys together)."""
        t = (
            df.with_columns(
                pl.col(col)
                .fill_null("")
                .str.extract_all(token_pattern)
                .alias("tok")
            )
            .select("__r", "tok")
            .explode("tok")
            .drop_nulls("tok")
        )
        parts = [pl.col("tok")] + [
            pl.col("tok").shift(-i).over("__r") for i in range(1, n)
        ]
        return (
            t.with_columns(pl.concat_str(parts, separator=" ").alias("g"))
            .drop_nulls("g")
            .select("__r", "g")
        )

    def eval_partial(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch.select([ev_text])).with_row_index("__r")
        out = _row_grams(df, ev_text).select("g").unique()
        return out.to_arrow().cast(pa.schema([("g", pa.string())]))

    from ..util import fold_broadcast_keys

    ev = fold_broadcast_keys(
        eval_ds.map_batches(eval_partial, batch_format="pyarrow"),
        "g",
        max_broadcast_bytes,
        "eval gram set",
        hint="this is corpus-sized, not benchmark-sized; route through a "
        "partitioned semi-join (bucket_hash_join on the gram stream) "
        "or raise max_broadcast_bytes",
        unique=True,
    )
    ev_ref = ray.put(sorted(ev))

    def probe(batch: pa.Table) -> pa.Table:
        grams_set = once_per_process(
            "decontam.exact_ngram", ev_ref,
            build=lambda ks: pl.Series("g", ks, dtype=pl.String),
        )
        # one output row per INPUT row, all input columns passed through
        # untouched (schema incl. the id type stays the caller's — the
        # ADVICE r3 hardcoded-typing trap); duplicate ids get
        # independent per-row verdicts
        clash = [c for c in (out_col, count_col) if c in batch.column_names]
        if clash:
            raise ValueError(
                f"input already has column(s) {clash} — a stacked "
                f"decontamination pass must rename via out_col/count_col"
            )
        docs = pl.from_arrow(batch.select([text_col])).with_row_index("__r")
        hits = (
            _row_grams(docs, text_col)
            .filter(pl.col("g").is_in(grams_set))
            .unique(["__r", "g"])
            .group_by("__r")
            .agg(pl.len().cast(pl.Int64).alias("n_matched"))
        )
        out = (
            docs.join(hits, on="__r", how="left", maintain_order="left")
            .with_columns(pl.col("n_matched").fill_null(0))
            .with_columns((pl.col("n_matched") > 0).alias("contaminated"))
        )
        return batch.append_column(
            out_col, out["contaminated"].to_arrow().cast(pa.bool_())
        ).append_column(
            count_col, out["n_matched"].to_arrow().cast(pa.int64())
        )

    return train_ds.map_batches(probe, batch_format="pyarrow")
