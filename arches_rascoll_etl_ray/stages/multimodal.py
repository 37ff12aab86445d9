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
        payloads = batch["payload"]
        feats = np.zeros((batch.num_rows, self.dims), dtype=np.float32)
        sizes = np.zeros(batch.num_rows, dtype=np.int64)
        for i, v in enumerate(payloads):
            raw = v.as_py()
            if raw is None:
                continue
            samples = self._decode(raw)
            sizes[i] = len(raw)
            if len(samples):
                hist, _ = np.histogram(samples, bins=self.edges)
                feats[i] = hist / max(1, len(samples))
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
        n_frames = np.zeros(batch.num_rows, dtype=np.int64)
        frames_col = []
        for i, v in enumerate(batch["payload"]):
            raw = v.as_py() or b""
            samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float32) / 255.0
            frames = [
                samples[o : o + self.frame_size].tolist()
                for o in range(0, max(0, len(samples) - self.frame_size + 1), self.hop)
            ]
            n_frames[i] = len(frames)
            frames_col.append(frames)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "frames": pa.array(frames_col, pa.list_(pa.list_(pa.float32()))),
                "n_frames": pa.array(n_frames),
            }
        )
