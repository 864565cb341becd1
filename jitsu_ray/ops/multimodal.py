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


class _MediaMetadataStage:
    """Shared per-batch plumbing for payload->metadata stages: backend
    constructed ONCE per actor (the expensive model/codec load);
    per-batch loop is over rows by necessity (opaque per-item codec
    calls); payload dropped after metadata. Use small batch_size (e.g.
    64) so batch_bytes x concurrency fits worker heaps."""

    #: subclasses set: backend factory, per-item method name, out schema
    BACKEND = None
    METHOD = ""
    OUT_FIELDS: list = []

    def __init__(self, backend=None):
        self.backend = (backend or self.BACKEND)()

    def __call__(self, batch: pa.Table) -> pa.Table:
        fn = getattr(self.backend, self.METHOD)
        metas = [
            fn(d.as_py() if d is not None else b"", m)
            for d, m in zip(batch["media"], batch["mime"].to_pylist())
        ]
        for name, typ in self.OUT_FIELDS:
            batch = batch.append_column(name, pa.array([m[name] for m in metas], typ))
        return batch.drop_columns(["media"])  # metadata out, payload dropped


class MediaDecoder(_MediaMetadataStage):
    BACKEND = FakeDecoder
    METHOD = "decode_one"
    OUT_FIELDS = [
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("channels", pa.int32()),
        ("content_sha256", pa.string()),
    ]


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


class FakeResizer:
    """Resize plumbing (composes a FakeDecoder — it is not itself a
    decode backend): target box + aspect-preserving scale computed from
    the (fake-decoded) source dims; payload would be re-encoded by a
    real backend — here it is dropped after metadata, like decode."""

    def __init__(self, max_w: int = 512, max_h: int = 512):
        self.max_w = max_w
        self.max_h = max_h
        self.decoder = FakeDecoder()

    def resize_one(self, data: bytes, mime: str) -> dict:
        meta = self.decoder.decode_one(data, mime)
        scale = min(self.max_w / meta["width"], self.max_h / meta["height"], 1.0)
        return {
            "src_width": meta["width"],
            "src_height": meta["height"],
            # floor with a 1px floor: a real resizer never emits a
            # zero-dimension image, whatever the box
            "width": max(1, int(meta["width"] * scale)),
            "height": max(1, int(meta["height"] * scale)),
            "content_sha256": meta["content_sha256"],
        }


class MediaResizer(_MediaMetadataStage):
    METHOD = "resize_one"
    OUT_FIELDS = [
        ("src_width", pa.int32()),
        ("src_height", pa.int32()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("content_sha256", pa.string()),
    ]


def resize_media(ds, max_w: int = 512, max_h: int = 512, concurrency: int = 4,
                 batch_size: int = 64):
    """Actor-pool resize stage (backend built once per actor; small
    batches for large payloads — same plumbing as decode_media via
    _MediaMetadataStage)."""
    return ds.map_batches(
        MediaResizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"backend": lambda: FakeResizer(max_w, max_h)},
    )


def frame_count(data: bytes) -> int:
    """Deterministic fake frame count: 1 + sha256 bytes [5:7] % 300
    (a real backend reads the container header). SQL twin in
    queries.SQL_FRAME_SAMPLE."""
    h = hashlib.sha256(data).digest()
    return 1 + int.from_bytes(h[5:7], "little") % 300


def sample_frames(ds, every_n: int = 10, fps: float = 25.0, batch_size: int = 64):
    """Video frame-sampling plumbing: one input row fans out to one row
    per sampled frame (frame_idx stepping by ``every_n``), with the
    frame timestamp at ``fps``. The flat-map shape — output rows >>
    input rows — is the part a real decoder drops into; frame pixel
    extraction is the stubbed codec call."""

    def sample(batch: pa.Table) -> pa.Table:
        ids, idxs, ts = [], [], []
        for mid, d in zip(batch["media_id"].to_pylist(), batch["media"]):
            n = frame_count(d.as_py() if d is not None else b"")
            for f in range(0, n, every_n):
                ids.append(mid)
                idxs.append(f)
                ts.append(f / fps)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(idxs, pa.int32()),
                "frame_ts": pa.array(ts, pa.float64()),
            }
        )

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=batch_size)
