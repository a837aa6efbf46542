"""Multimodal (image/audio/video) columns as opaque binary + typed
metadata, with actor-pool decode/feature stages.

Layout convention: a media table carries ``payload: large_binary`` plus
typed metadata columns (``media_type``, ``width``/``height`` or
``sample_rate``/``n_frames``) — big blobs stay out of every stage that
does not need them (project early, SURVEY.md §7.4 "very wide rows").

The actual codecs (PIL/ffmpeg/soundfile) are NOT available in this
environment, so the decode kernel is stubbed: ``DecodeStage`` with
``impl="real"`` raises :class:`NotImplementedError` where the codec call
belongs, and ``impl="fake"`` runs a deterministic stand-in that parses
the synthetic header written by :func:`make_synthetic_media_batch`.  The
Ray-side plumbing — schema, batch sizing for large binaries, actor-pool
signature (init-once state in ``__init__``), output layout — is real and
tested; swapping in a real codec changes one method.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),
        ("n_frames", pa.int32()),
    ]
)

_MAGIC = b"SYNM"


def make_synthetic_media_batch(ids: np.ndarray, media_type: str = "image") -> pa.Table:
    """Deterministic fake media rows: payload = magic + packed dims +
    id-seeded bytes.  Stands in for real files in tests/benches."""
    rows = []
    widths = np.zeros(len(ids), np.int32)
    heights = np.zeros(len(ids), np.int32)
    srs = np.zeros(len(ids), np.int32)
    nfs = np.zeros(len(ids), np.int32)
    for i, mid in enumerate(ids):
        seed = hashlib.sha256(f"media:{media_type}:{mid}".encode()).digest()
        widths[i] = 64 + seed[0] % 192
        heights[i] = 64 + seed[1] % 192
        srs[i] = 8000 + (seed[2] % 5) * 8000
        nfs[i] = 1 + seed[3] % 120
        header = _MAGIC + struct.pack(
            "<iiii", widths[i], heights[i], srs[i], nfs[i]
        )
        body = (seed * ((widths[i] * 4) // len(seed) + 1))[: widths[i] * 4]
        rows.append(header + body)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "media_type": pa.array([media_type] * len(ids), pa.string()),
            "payload": pa.array(rows, pa.large_binary()),
            "width": pa.array(widths),
            "height": pa.array(heights),
            "sample_rate": pa.array(srs),
            "n_frames": pa.array(nfs),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStage:
    """Actor-pool decode: payload → decoded features.

    Use with ``map_batches(DecodeStage, fn_constructor_kwargs=...,
    concurrency=N, batch_size=SMALL, num_cpus=1)`` — batch_size must stay
    small because each row can be megabytes (media batches are sized by
    bytes, not rows).  Codec state (model weights, codec context) belongs
    in ``__init__`` — loaded once per actor.
    """

    def __init__(self, impl: str = "fake"):
        if impl not in ("fake", "real"):
            raise ValueError("impl must be 'fake' or 'real'")
        self.impl = impl
        # real-codec init would go here (once per actor), e.g.:
        #   import PIL.Image  /  av.open  /  soundfile
        self.decoded = 0

    def _decode_real(self, payload: bytes) -> tuple[int, int, float]:
        raise NotImplementedError(
            "real media codecs are not available in this environment; "
            "plug PIL/ffmpeg here (parse payload → (width, height, mean))"
        )

    def _decode_fake(self, payload: bytes) -> tuple[int, int, float]:
        if payload[:4] != _MAGIC:
            raise ValueError("bad synthetic media header")
        w, h, _sr, _nf = struct.unpack("<iiii", payload[4:20])
        body = np.frombuffer(payload[20:], dtype=np.uint8)
        return w, h, float(body.mean()) if len(body) else 0.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._decode_fake if self.impl == "fake" else self._decode_real
        ws, hs, means = [], [], []
        for payload in batch.column("payload").to_pylist():
            w, h, m = decode(payload)
            ws.append(w)
            hs.append(h)
            means.append(m)
        self.decoded += batch.num_rows
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "decoded_width": pa.array(ws, pa.int32()),
                "decoded_height": pa.array(hs, pa.int32()),
                "pixel_mean": pa.array(means, pa.float64()),
            }
        )


class ResizeStage:
    """Feature stage operating on decoded dims (no payload needed —
    projected away upstream): computes target size preserving aspect."""

    def __init__(self, max_side: int = 224):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch.column("decoded_width").to_numpy().astype(np.float64)
        h = batch.column("decoded_height").to_numpy().astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        # round, don't truncate: w*(max_side/w) lands at 223.999.. for
        # many widths, and the max side must come out EXACTLY max_side
        return batch.append_column(
            "target_width", pa.array(np.rint(w * scale).astype(np.int32))
        ).append_column(
            "target_height", pa.array(np.rint(h * scale).astype(np.int32))
        )


def frame_sample_offsets(n_frames: np.ndarray, every_k: int) -> list[np.ndarray]:
    """Video frame-sampling plan: indices of every k-th frame per row."""
    return [np.arange(0, int(n), every_k, dtype=np.int64) for n in n_frames]


class FrameSampleStage:
    """Video stage: expands each row into its sampled frame plan
    (media_id, frame_idx) — the decode of each frame is then a DecodeStage
    problem.  flat_map-shaped: output rows ≥ input rows."""

    def __init__(self, every_k: int = 10):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy()
        plans = frame_sample_offsets(batch.column("n_frames").to_numpy(), self.every_k)
        out_id = np.repeat(ids, [len(p) for p in plans])
        out_frame = np.concatenate(plans) if plans else np.empty(0, np.int64)
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_frame, pa.int64()),
            }
        )


def decode_pipeline(ds, impl: str = "fake", concurrency: int = 2,
                    batch_size: int = 64):
    """payload-bearing Dataset → decoded features via an actor pool."""
    return ds.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"impl": impl},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,  # small: rows are megabytes at real scale
        concurrency=concurrency,
        num_cpus=1,
    )
