"""Multimodal (binary-payload) stages: real Ray plumbing, stubbed codecs.

Image/audio/video decode libraries are not in this container, so the decode
itself is STUBBED (`decode_mode="stub"` → deterministic byte-level pseudo
decode; `"real"` → NotImplementedError). Everything around it — opaque
`binary` column + typed metadata schema, actor-pool map_batches signature,
bytes-aware batch sizing, Arrow-native output layout — is real and tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


class BinaryFeatureExtractor:
    """Actor-pool stage (`map_batches(BinaryFeatureExtractor, concurrency=N,
    batch_size=B)`): setup once per actor in __init__ (the reference's
    import-time constant dicts, arches_rascoll/groups.py:8-27, become actor
    state), per-batch vectorized work in __call__.

    Input : table with `payload: binary` (+ passthrough id columns)
    Output: id columns + `feature: list<float>` + `payload_bytes: int64`

    Large payloads: callers must size `batch_size` by BYTES (rows ≈
    target_bytes / avg_payload) and keep batch_format='pyarrow' so the binary
    column never round-trips through pandas object dtype.
    """

    def __init__(self, decode_mode: str = "stub", feature_dims: int = 16, id_column: str = "doc_id"):
        if decode_mode not in ("stub", "real"):
            raise ValueError(f"unknown decode_mode {decode_mode!r}")
        self.decode_mode = decode_mode
        self.dims = feature_dims
        self.id_column = id_column
        # once-per-actor setup: bin edges for the byte histogram featurizer
        self.edges = np.linspace(0, 256, feature_dims + 1)

    def _decode(self, payload: bytes) -> np.ndarray:
        if self.decode_mode == "real":
            raise NotImplementedError(
                "real image/audio decode requires codec libraries not present "
                "in this environment; use decode_mode='stub'"
            )
        # deterministic pseudo-decode: raw byte stream as uint8 samples
        return np.frombuffer(payload, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode_mode == "real":
            # surface the stub boundary up front (and per-payload in _decode)
            self._decode(b"")
        col = batch["payload"].combine_chunks()
        n = len(col)
        # vectorized byte histogram straight from the Arrow binary buffers:
        # one bincount over (row*dims + bin) indices — no per-payload Python
        bufs = col.buffers()
        if bufs[2] is None or n == 0:
            sizes = np.zeros(n, dtype=np.int64)
            feats = np.zeros((n, self.dims), dtype=np.float32)
        else:
            offs = np.frombuffer(bufs[1], dtype=np.int32)[col.offset : col.offset + n + 1].astype(np.int64)
            data = np.frombuffer(bufs[2], dtype=np.uint8)
            sizes = offs[1:] - offs[:-1]
            byte_vals = data[offs[0] : offs[-1]]
            row_of = np.repeat(np.arange(n, dtype=np.int64), sizes)
            # bin = byte * dims // 256 — identical to np.histogram over
            # linspace(0, 256, dims+1) edges for byte-valued samples
            bins = (byte_vals.astype(np.int64) * self.dims) >> 8
            counts = np.bincount(row_of * self.dims + bins, minlength=n * self.dims)
            feats = (
                counts.reshape(n, self.dims) / np.maximum(1, sizes)[:, None]
            ).astype(np.float32)
        out = pa.table(
            {
                self.id_column: batch[self.id_column],
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), self.dims
                ),
                "payload_bytes": pa.array(sizes),
            }
        )
        return out


class FrameSampler:
    """Actor-pool stage for time-series binary payloads (audio/video):
    sample fixed-rate frames from an opaque byte stream. The codec is
    stubbed (raw bytes = samples; 'real' raises NotImplementedError) but the
    plumbing is real: list<list<float>> frame output, bytes-aware batching.
    """

    def __init__(self, decode_mode: str = "stub", frame_size: int = 64, hop: int = 128):
        if decode_mode not in ("stub", "real"):
            raise ValueError(f"unknown decode_mode {decode_mode!r}")
        self.decode_mode = decode_mode
        self.frame_size = frame_size
        self.hop = hop

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decode_mode == "real":
            raise NotImplementedError("audio/video codecs not available in this environment")
        col = batch["payload"].combine_chunks()
        n = len(col)
        fs, hop = self.frame_size, self.hop
        bufs = col.buffers()
        if bufs[2] is None or n == 0:
            offs = np.zeros(n + 1, dtype=np.int64)
            data = np.empty(0, dtype=np.uint8)
        else:
            offs = np.frombuffer(bufs[1], dtype=np.int32)[col.offset : col.offset + n + 1].astype(np.int64)
            data = np.frombuffer(bufs[2], dtype=np.uint8)
        lens = offs[1:] - offs[:-1]
        n_frames = np.where(lens >= fs, (lens - fs) // hop + 1, 0)
        # gather every frame's samples in ONE fancy-index: frame f of row i
        # starts at offs[i] + f*hop; build the flat start array and add the
        # within-frame arange — no per-payload tolist()
        frame_starts = np.concatenate(
            [offs[i] + np.arange(n_frames[i], dtype=np.int64) * hop for i in range(n)]
        ) if n else np.empty(0, dtype=np.int64)
        total = int(n_frames.sum())
        if total:
            mat = data[frame_starts[:, None] + np.arange(fs, dtype=np.int64)[None, :]]
            values = (mat.astype(np.float32) / 255.0).reshape(-1)
        else:
            values = np.empty(0, dtype=np.float32)
        inner = pa.ListArray.from_arrays(
            pa.array(np.arange(total + 1, dtype=np.int32) * fs),
            pa.array(values, pa.float32()),
        )
        outer = pa.ListArray.from_arrays(
            pa.array(np.concatenate([[0], np.cumsum(n_frames)]).astype(np.int32)), inner
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "frames": outer,
                "n_frames": pa.array(n_frames.astype(np.int64)),
            }
        )
