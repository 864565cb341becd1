"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

These extend the engine beyond the reference's operator set (which has
no text analytics) toward a 100 TB pre-training pipeline. All stages
are stateful callable classes for `map_batches(Cls, concurrency=N)`
actor pools (regexes / tables compiled once per actor, SURVEY §2.3),
vectorized with pandas str kernels / numpy per batch.
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "for", "on", "with", "that", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu", "den"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "por"},
    "fr": {"le", "la", "de", "et", "un", "une", "les", "des", "est", "dans", "pour"},
}


class TextStats:
    """Vectorized length/token stats. n_tokens is defined as
    count(' ') + 1 — a spec shared with the SQL oracle so both sides
    compute the identical quantity."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(
            pc.add(pc.count_substring(pc.cast(text, pa.string()), " "), 1), pa.int64()
        )
        batch = batch.append_column("n_chars2", n_chars)
        return batch.append_column("n_tokens", n_tokens)


class QualityScore:
    """Heuristic doc-quality features (stopword / punctuation / upper
    ratios, mean word length) — per-actor compiled regexes."""

    def __init__(self):
        self.word_re = re.compile(r"[A-Za-z]+")
        self.punct_re = re.compile(r"[^\w\s]")
        self.stop = _STOPWORDS["en"]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"].fillna("")
        words = text.str.findall(self.word_re)
        n_words = words.map(len).clip(lower=1)
        batch["stopword_ratio"] = (
            words.map(lambda ws: sum(1 for w in ws if w.lower() in self.stop)) / n_words
        )
        batch["punct_ratio"] = text.str.count(self.punct_re) / text.str.len().clip(lower=1)
        batch["mean_word_len"] = words.map(lambda ws: float(np.mean([len(w) for w in ws])) if ws else 0.0)
        batch["quality_ok"] = (batch["stopword_ratio"] > 0.01) & (batch["punct_ratio"] < 0.3)
        return batch


class LangId:
    """n-gram/stopword-vote language classifier. Deterministic, tiny —
    a stand-in for fasttext-style models, wired as an actor so a real
    model would load once per actor in __init__."""

    def __init__(self):
        self.word_re = re.compile(r"[A-Za-zÀ-ÿ]+")
        self.tables = {lang: ws for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def classify(text: str) -> str:
            words = [w.lower() for w in self.word_re.findall(text or "")][:200]
            if not words:
                return "und"
            scores = {
                lang: sum(1 for w in words if w in tbl) for lang, tbl in self.tables.items()
            }
            best = max(scores, key=lambda k: (scores[k], k))
            return best if scores[best] > 0 else "und"

        batch["lang_pred"] = batch["text"].map(classify)
        return batch


class TokenCount:
    """BPE-ish token counting: words + punctuation runs, the usual
    pre-tokenizer regex."""

    def __init__(self):
        self.tok_re = re.compile(r"\w+|[^\w\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_bpe_tokens"] = batch["text"].fillna("").str.count(self.tok_re)
        return batch


class Fingerprint:
    """Order-sensitive rolling document fingerprint: crc32 of each token
    folded with a polynomial rolling hash -> int64. Stable across
    processes (no PYTHONHASHSEED dependence)."""

    MOD = (1 << 61) - 1
    BASE = 1_000_003

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        def fp(text: str) -> int:
            h = 0
            for tok in (text or "").split():
                h = (h * self.BASE + zlib.crc32(tok.encode())) % self.MOD
            return h - (self.MOD if h > self.MOD // 2 else 0)  # center into int64

        batch["fingerprint"] = batch["text"].map(fp).astype("int64")
        return batch
