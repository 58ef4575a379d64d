"""Multimodal column plumbing: image/audio/video as opaque ``binary``
payloads with typed metadata, processed by Arrow-batched UDFs.

The decode step itself is STUBBED (this container has no image/audio
libraries — see ``decode_image``); everything Spark-side is real and
tested: the schema, the partitioning, the ``mapInPandas`` batch shape,
and the deterministic fake feature extractor used by tests.  Dropping
in a real decoder (PIL / torchaudio / pyav) only replaces the body of
``decode_image`` / ``sample_frames``.

Schema:
    assets(asset_id: long, modality: string, payload: binary,
           meta: map<string,string>)
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = "asset_id long, modality string, payload binary, meta map<string,string>"

FEATURE_DIM = 16

REAL_DECODERS_AVAILABLE = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    REAL_DECODERS_AVAILABLE = True
except Exception:
    pass


def decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to an HxWxC array.

    STUB: real decoding needs an image library that is not in this
    container.  The deterministic fake below (used by tests) derives a
    pseudo-image from the payload hash so the downstream plumbing
    (resize, feature extraction, batching) is fully exercised."""
    if REAL_DECODERS_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("wire PIL.Image.open here when available")
    h = hashlib.sha256(payload).digest()
    side = 4 + h[0] % 4  # 4..7
    rng = np.frombuffer((h * ((side * side * 3) // len(h) + 1))[: side * side * 3], dtype=np.uint8)
    return rng.reshape(side, side, 3)


def resize_image(img: np.ndarray, size: int = 4) -> np.ndarray:
    """Nearest-neighbour resize to (size, size, C) — pure numpy."""
    idx_r = (np.arange(size) * img.shape[0] // size).clip(0, img.shape[0] - 1)
    idx_c = (np.arange(size) * img.shape[1] // size).clip(0, img.shape[1] - 1)
    return img[idx_r][:, idx_c]


def image_features(img: np.ndarray) -> np.ndarray:
    """Deterministic FEATURE_DIM-float feature: per-cell channel means of
    a resized grid (a stand-in for a CNN embedding)."""
    small = resize_image(img, 2)  # 2x2x3 = 12 values
    flat = small.astype(np.float64).reshape(-1)
    out = np.zeros(FEATURE_DIM)
    out[: flat.size] = flat / 255.0
    out[flat.size] = img.shape[0]
    out[flat.size + 1] = img.shape[1]
    return out


FEATURES_SCHEMA = (
    "asset_id long, modality string, n_bytes long, height int, width int, "
    f"features array<double>"
)


def extract_features(
    assets: DataFrame,
    batch_hint: int = 1024,
    image_decoder=None,
    frame_sampler=None,
) -> DataFrame:
    """assets -> (asset_id, modality, n_bytes, height, width, features).

    One Arrow pass; payload bytes never leave the executor.  Video
    payloads get frame-sampled first (``sample_frames``) and average the
    per-frame features.

    ``image_decoder``/``frame_sampler`` are the REAL-DECODER SEAM:
    ``image_decoder(payload) -> HxWxC array`` and
    ``frame_sampler(payload, n_frames=3) -> list of arrays`` (the
    sampler IS called with the ``n_frames`` keyword).  They must be
    passed here (not monkey-patched on the module) because the UDF
    closure is what ships to executors — a module global set on the
    driver never reaches the workers.
    """
    dec = image_decoder if image_decoder is not None else decode_image
    sampler = frame_sampler if frame_sampler is not None else (
        lambda payload, n_frames=3: sample_frames(payload, n_frames, decoder=dec)
    )

    def run(batches):
        for pdf in batches:
            out = {
                "asset_id": [], "modality": [], "n_bytes": [],
                "height": [], "width": [], "features": [],
            }
            for aid, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(payload)
                if modality == "video":
                    frames = sampler(payload, n_frames=3)
                    feats = np.mean([image_features(f) for f in frames], axis=0)
                    h, w = frames[0].shape[:2]
                elif modality in ("image", "audio"):
                    img = dec(payload)
                    feats = image_features(img)
                    h, w = img.shape[:2]
                else:
                    feats = np.zeros(FEATURE_DIM)
                    h = w = 0
                out["asset_id"].append(int(aid))
                out["modality"].append(modality)
                out["n_bytes"].append(len(payload))
                out["height"].append(int(h))
                out["width"].append(int(w))
                out["features"].append(feats.tolist())
            yield pd.DataFrame(out)

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


def sample_frames(
    payload: bytes, n_frames: int = 3, decoder=None
) -> list[np.ndarray]:
    """Frame sampling STUB: derives n deterministic pseudo-frames from
    payload slices (a real implementation seeks the container's
    keyframes).  ``decoder`` decodes each frame slice (defaults to the
    stub ``decode_image``)."""
    dec = decoder if decoder is not None else decode_image
    step = max(1, len(payload) // n_frames)
    return [
        dec(payload[i * step : (i + 1) * step] or b"\x00")
        for i in range(n_frames)
    ]


def make_assets(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Test helper: manufacture an assets table from a documents table
    (text bytes as payload, modality round-robin by id)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(text_col, "UTF-8").alias("payload"),
        F.create_map(
            F.lit("src"), F.lit("synthetic"), F.lit("codec"), F.lit("fake")
        ).alias("meta"),
    )
