"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video are `binary` columns; decode / feature-extraction /
resize / frame-sample are actor-pool map_batches stages sized for large
payloads (small batch_size, pyarrow end to end). The actual codec calls
are STUBBED — PIL/ffmpeg are not in this container — behind
`DecoderBackend`: the default `FakeDecoder` derives deterministic
pseudo-metadata from the bytes so the Ray-side plumbing (schema, actor
signature, batch sizing, output layout) is real and tested; a real
backend drops in by replacing `decode_one`.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media", pa.large_binary()),
        ("mime", pa.string()),
    ]
)


class DecoderBackend:
    def decode_one(self, data: bytes, mime: str) -> dict:
        raise NotImplementedError(
            "real image/audio decoding needs PIL/ffmpeg, not present in this "
            "container; use FakeDecoder or plug a backend in"
        )


class FakeDecoder(DecoderBackend):
    """Deterministic stand-in: metadata derived from a sha256 of the
    payload (stable across runs/processes, and sha256 exists in DuckDB
    so the driver oracle can recompute every field), so tests can
    assert exact outputs."""

    def decode_one(self, data: bytes, mime: str) -> dict:
        h = hashlib.sha256(data).digest()
        w = 64 + int.from_bytes(h[0:2], "little") % 1984  # 64..2047
        hgt = 64 + int.from_bytes(h[2:4], "little") % 1984
        return {
            "width": w,
            "height": hgt,
            "n_bytes": len(data),
            "channels": 1 + h[4] % 4,
            "content_sha256": h.hex(),
        }


class MediaDecoder:
    """Actor-pool stage: backend constructed ONCE per actor (the expensive
    model/codec load); per-batch loop is over rows by necessity (opaque
    per-item codec calls). Use small batch_size (e.g. 64) so
    batch_bytes x concurrency fits worker heaps."""

    def __init__(self, backend: type[DecoderBackend] = FakeDecoder):
        self.backend = backend()

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [
            self.backend.decode_one(d.as_py() if d is not None else b"", m)
            for d, m in zip(batch["media"], batch["mime"].to_pylist())
        ]
        for name, typ in [
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("n_bytes", pa.int64()),
            ("channels", pa.int32()),
            ("content_sha256", pa.string()),
        ]:
            batch = batch.append_column(name, pa.array([m[name] for m in metas], typ))
        return batch.drop_columns(["media"])  # metadata out, payload dropped


class FakeFeatureExtractor:
    """Embedding-extraction plumbing: binary -> fixed-dim float vector
    (here: seeded from the payload sha; a real model is a drop-in).
    Output is a list<float> column compatible with ops.similarity."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = []
        for d in batch["media"]:
            data = d.as_py() or b""
            seed = int.from_bytes(hashlib.sha1(data).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            vecs.append(rng.standard_normal(self.dim).astype(np.float32))
        col = pa.array([v.tolist() for v in vecs], pa.list_(pa.float32()))
        return batch.append_column("embedding", col).drop_columns(["media"])


def decode_media(ds, backend: type[DecoderBackend] = FakeDecoder, concurrency: int = 4,
                 batch_size: int = 64):
    return ds.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"backend": backend},
    )
