"""Multimodal column plumbing (image/audio as opaque binary + metadata).

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — decode_image raises NotImplementedError unless the
deterministic fake is requested), but the Ray-side plumbing is real and
tested: schema, actor signature, small-batch sizing for wide binary rows,
and columnar output layout.

Design notes for 100 TB: binary payload batches must be SMALL
(batch_size=8-32) so batch × concurrency fits worker heaps; blocks with
multi-MB rows should flow with `batch_format="pyarrow"` end-to-end (pandas
would copy); real decoders would be actor pools with the model/codec
loaded once in __init__.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # "image" | "audio"
        ("payload", pa.binary()),       # opaque encoded bytes
        ("meta", pa.struct([("width", pa.int32()), ("height", pa.int32()),
                            ("sample_rate", pa.int32())])),
    ]
)

FEATURE_DIM = 16


class MediaFeatureUDF:
    """Actor stage: binary payload → fixed-dim feature vector.

    ``fake=True`` (default here) derives a deterministic pseudo-feature
    from the payload hash — the honest stand-in that keeps the pipeline
    shape testable. ``fake=False`` is the real-decoder seam and raises
    NotImplementedError (no codec libraries in this environment).
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, payload: bytes) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "real image/audio decoding requires codec libraries not "
                "present in this environment; use fake=True"
            )
        digest = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM * 4).digest()
        return np.frombuffer(digest, dtype=np.uint32).astype(np.float32) / 2**32

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = [self._decode(p).tolist() for p in payloads]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "feature": pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=64, dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(range(n), pa.int64()),
            "kind": pa.array(["image" if i % 2 == 0 else "audio" for i in range(n)]),
            "payload": pa.array(payloads, pa.binary()),
            "meta": pa.array(
                [{"width": 64, "height": 64, "sample_rate": 0} if i % 2 == 0
                 else {"width": 0, "height": 0, "sample_rate": 16000}
                 for i in range(n)],
                MEDIA_SCHEMA.field("meta").type,
            ),
        }
    )


class ImageResizeUDF:
    """Resize stage shape: payload+meta in → payload+meta out. The pixel
    work is stubbed (deterministic payload transform) — the Ray-side
    contract (small batches, pyarrow end-to-end, meta update) is real."""

    def __init__(self, width: int = 32, height: int = 32, fake: bool = True):
        self.width = width
        self.height = height
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("no image codec in this environment")
        payloads = batch.column("payload").to_pylist()
        # deterministic stand-in for decode→resize→encode
        resized = [
            hashlib.blake2b(p or b"", digest_size=self.width * self.height // 16).digest()
            for p in payloads
        ]
        meta = [
            {"width": self.width, "height": self.height, "sample_rate": 0}
            for _ in payloads
        ]
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "payload": pa.array(resized, pa.binary()),
                "meta": pa.array(meta, MEDIA_SCHEMA.field("meta").type),
            }
        )


class AudioFrameSampleUDF:
    """Frame-sampling stage shape: emits N fixed-stride frame features per
    clip (flat_map-like: one input row → N output rows)."""

    def __init__(self, n_frames: int = 4, fake: bool = True):
        self.n_frames = n_frames
        self.fake = fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError("no audio codec in this environment")
        ids_out, frame_out, feat_out = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            for f in range(self.n_frames):
                digest = hashlib.blake2b(
                    (payload or b"") + f.to_bytes(4, "little"),
                    digest_size=FEATURE_DIM * 4,
                ).digest()
                ids_out.append(mid)
                frame_out.append(f)
                feat_out.append(
                    (np.frombuffer(digest, dtype=np.uint32).astype(np.float32) / 2**32).tolist()
                )
        return pa.table(
            {
                "media_id": pa.array(ids_out, pa.int64()),
                "frame_idx": pa.array(frame_out, pa.int32()),
                "feature": pa.array(feat_out, pa.list_(pa.float32(), FEATURE_DIM)),
            }
        )
