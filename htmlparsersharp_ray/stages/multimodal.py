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
