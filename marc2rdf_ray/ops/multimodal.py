"""Multimodal column plumbing: opaque binary payloads with typed metadata.

Images/audio/video travel as ``binary`` columns next to typed metadata
columns.  The Ray-side plumbing -- schema, actor-pool stage shape, small
batch sizes for wide rows, output layout -- is real and tested; the actual
codec work is STUBBED (no image/audio libraries in this environment):

- ``DecodeStub`` raises NotImplementedError unless constructed with
  ``fake=True``, in which case it produces a deterministic fake decode
  (dimensions parsed from the payload header our synthesizer writes).
- ``FeatureExtractStub`` emits a deterministic 8-dim feature vector
  (byte histogram projection) -- a stand-in for model inference with the
  same batched actor-pool call shape.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),        # opaque bytes
        ("mime", pa.string()),
        ("width", pa.int32()),           # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

_MAGIC = b"FAKEIMG1"


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows: payload = magic + w + h + blob."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        w, ht = 64 + h[0] % 64, 64 + h[1] % 64
        blob = (h * ((w * ht) // len(h) + 1))[: w * ht // 16]
        payload = _MAGIC + struct.pack("<II", w, ht) + blob
        rows.append(
            {
                "media_id": i,
                "kind": "image",
                "payload": payload,
                "mime": "image/fake",
                "width": 0,
                "height": 0,
                "duration_ms": 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class DecodeStub:
    """Actor-pool decode stage.  Real decode is NOT implemented here
    (no codec libs in this container); ``fake=True`` parses the synthetic
    header deterministically so the pipeline shape is testable.

    Use with:  ds.map_batches(DecodeStub, fn_constructor_kwargs={"fake": True},
                              batch_size=64, concurrency=N)
    (small batch_size: wide binary rows, see ray_guide memory notes)."""

    def __init__(self, fake: bool = False):
        if not fake:
            raise NotImplementedError(
                "media decode requires codec libraries not present in this "
                "environment; construct with fake=True for the deterministic "
                "test decoder"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        widths, heights, ok = [], [], []
        for p in payloads:
            if p and p[:8] == _MAGIC and len(p) >= 16:
                w, h = struct.unpack("<II", p[8:16])
                widths.append(w)
                heights.append(h)
                ok.append(True)
            else:
                widths.append(0)
                heights.append(0)
                ok.append(False)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "decode_ok": pa.array(ok, pa.bool_()),
            }
        )


class FeatureExtractStub:
    """Deterministic 8-dim features from payload bytes (byte-histogram
    projection) -- model-inference call shape without a model."""

    def __init__(self, dim: int = 8, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.proj = rng.randn(256, dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch["payload"].to_pylist():
            hist = np.bincount(
                np.frombuffer(p or b"\0", dtype=np.uint8), minlength=256
            ).astype(np.float64)
            total = hist.sum() or 1.0
            feats.append(np.round(hist / total @ self.proj, 6).tolist())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array(feats, pa.list_(pa.float64())),
            }
        )
