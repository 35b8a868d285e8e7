"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video travel as Arrow ``binary`` columns with metadata
(format, width/height or sample-rate, etc.). Decode / resize /
feature-extract run as ACTOR-POOL ``map_batches`` stages — the codec
libraries are loaded once per actor in ``__init__``.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container,
so the decode kernels are stubbed: ``DecodeImageStage`` raises
``NotImplementedError`` unless ``fake=True``, in which case it derives
a deterministic fake decode from the payload bytes. The Ray-side
plumbing — schema handling, small-batch sizing for large payloads,
actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def synth_image_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake 'image' rows: payload bytes + metadata."""
    rs = np.random.RandomState(seed)
    payloads = [rs.bytes(256 + int(rs.randint(0, 512))) for _ in range(n)]
    return pa.table({
        "img_id": pa.array(range(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "format": pa.array(["png" if i % 2 else "jpeg" for i in range(n)]),
        "width": pa.array([64 + (i % 8) * 32 for i in range(n)], type=pa.int32()),
        "height": pa.array([64 + (i % 5) * 32 for i in range(n)], type=pa.int32()),
    })


class DecodeImageStage:
    """Actor-pool stage: binary payload → fixed-size feature vector.

    Real deployments replace ``_decode`` with PIL/torchvision; batch
    size should be small (large payloads × batch × concurrency must
    fit worker heap — see module docstring).
    """

    def __init__(self, feature_dim: int = 16, fake: bool = False):
        self.feature_dim = feature_dim
        self.fake = fake
        if not fake:
            try:
                import PIL  # noqa: F401
                self.pil = True
            except ImportError:
                self.pil = False

    def _decode(self, payload: bytes, fmt: str) -> np.ndarray:
        if self.fake:
            # deterministic fake: hash-seeded feature vector
            h = hashlib.sha256(payload).digest()
            raw = np.frombuffer((h * ((self.feature_dim * 4) // len(h) + 1))
                                [:self.feature_dim * 4], dtype=np.uint32)
            return (raw % 1000).astype(np.float32) / 1000.0
        if not getattr(self, "pil", False):
            raise NotImplementedError(
                "image codecs not available in this environment; "
                "construct DecodeImageStage(fake=True) for plumbing tests")
        raise NotImplementedError("real decode path requires PIL")

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p, f) for p, f in
                 zip(batch.column("payload").to_pylist(),
                     batch.column("format").to_pylist())]
        return batch.append_column(
            "features", pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())))


class FrameSampleStage:
    """Video-style frame sampling stub: emits every k-th 'frame' index
    with deterministic byte slices as fake frames."""

    def __init__(self, every_k: int = 8):
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frame_idx, frames = [], [], []
        for i, p in zip(batch.column("img_id").to_pylist(),
                        batch.column("payload").to_pylist()):
            for fi in range(0, max(1, len(p) // 64), self.every_k):
                ids.append(i)
                frame_idx.append(fi)
                frames.append(p[fi * 64:(fi + 1) * 64])
        return pa.table({"img_id": pa.array(ids, type=pa.int64()),
                         "frame_idx": pa.array(frame_idx, type=pa.int32()),
                         "frame": pa.array(frames, type=pa.binary())})


def decode_images(ds, concurrency=(1, 4), batch_size: int = 32,
                  fake: bool = True):
    """The canonical actor-pool decode pipeline (small batches: binary
    payloads are heavy; batch × concurrency sized to worker heap)."""
    return ds.map_batches(DecodeImageStage,
                          fn_constructor_kwargs={"fake": fake},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


# ------------------------------------------------------------- audio
def synth_audio_table(n: int = 64, seed: int = 43) -> pa.Table:
    """Deterministic fake 'audio' rows: PCM-ish payload + metadata."""
    rs = np.random.RandomState(seed)
    payloads = [rs.bytes(1024 + int(rs.randint(0, 2048))) for _ in range(n)]
    return pa.table({
        "audio_id": pa.array(range(n), type=pa.int64()),
        "payload": pa.array(payloads, type=pa.binary()),
        "codec": pa.array(["wav" if i % 2 else "flac" for i in range(n)]),
        "sample_rate": pa.array([16000 if i % 3 else 44100
                                 for i in range(n)], type=pa.int32()),
        "n_channels": pa.array([1 + (i % 2) for i in range(n)],
                               type=pa.int8()),
    })


class DecodeAudioStage:
    """Actor-pool stage: audio payload → windowed energy features.

    Real deployments load the codec (soundfile/torchaudio) once per
    actor in ``__init__``; absent from this container, so the decode
    raises unless ``fake=True`` — the fake treats the payload bytes as
    int8 PCM and computes real windowed RMS energies, which keeps the
    downstream plumbing (list<float> feature column, small batches,
    actor signature) honest.
    """

    def __init__(self, n_windows: int = 8, fake: bool = False):
        self.n_windows = n_windows
        self.fake = fake
        if not fake:
            try:
                import soundfile  # noqa: F401
                self.codec = True
            except ImportError:
                self.codec = False

    def _features(self, payload: bytes, codec: str) -> np.ndarray:
        if not self.fake:
            if not getattr(self, "codec", False):
                raise NotImplementedError(
                    "audio codecs not available in this environment; "
                    "construct DecodeAudioStage(fake=True) for plumbing "
                    "tests")
            raise NotImplementedError("real decode requires soundfile")
        pcm = np.frombuffer(payload, dtype=np.int8).astype(np.float32)
        w = max(1, len(pcm) // self.n_windows)
        ends = [min(len(pcm), (i + 1) * w) for i in range(self.n_windows)]
        out = np.zeros(self.n_windows, dtype=np.float32)
        for i, e in enumerate(ends):
            seg = pcm[i * w:e]
            if len(seg):
                out[i] = np.sqrt(np.mean(seg * seg))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._features(p, c) for p, c in
                 zip(batch.column("payload").to_pylist(),
                     batch.column("codec").to_pylist())]
        return batch.append_column(
            "energies", pa.array([f.tolist() for f in feats],
                                 type=pa.list_(pa.float32())))


def decode_audio(ds, concurrency=(1, 4), batch_size: int = 16,
                 fake: bool = True):
    return ds.map_batches(DecodeAudioStage,
                          fn_constructor_kwargs={"fake": fake},
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)
