"""Multimodal pipelines: media synthesis, dims census, decode features.

``media_dims_census`` is the direct analog of the reference's blocking
census — group count by (extension, width, height)
(/root/reference/src/main.rs:365-435) — with dimensions probed from binary
headers, never trusted from metadata."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ..stages.multimodal import MediaDecode, probe_dims_batch, synth_media_batch
from .common import canonical_sort, read

# below this many payload rows, decode/feature stages dispatch as plain
# tasks: the synthetic stage constructors are cheap by design (format
# dispatch tables only), so the actor pool's startup (~2 s at suite
# sizes, measured) buys nothing. The ACTOR-POOL path is the scale path —
# a real deployment amortizes codec/model loads once per actor — and is
# unchanged above the ceiling.
_TASK_PATH_MAX_ROWS = 100_000


def _doc_rows(sf_dir: str) -> "int | None":
    """Row count of the documents table from parquet metadata (no scan) —
    the dispatch hint for synth/planted payload stages (1 row per doc).
    None when the layout isn't the single-file testdata shape."""
    import os

    import pyarrow.parquet as pq

    try:
        return pq.read_metadata(
            os.path.join(sf_dir, "documents.parquet")
        ).num_rows
    except Exception:  # noqa: BLE001 - fall back to ds.count()
        return None


def _payload_stage(ds, cls, *ctor_args, batch_size: int = 128, n_rows=None):
    """Size-gated decode/feature stage: task dispatch below
    ``_TASK_PATH_MAX_ROWS``, actor pool (the scale path) above.

    ``n_rows`` is a dispatch HINT: for lazy synth pipelines ``ds.count()``
    would execute the whole upstream chain once just to pick the dispatch
    mode and then again for the real run — callers that know the row
    count (1 row per document for the synth/planted tables) pass it from
    parquet metadata instead. Only the task/actor choice depends on it,
    so an approximation is safe."""
    if (ds.count() if n_rows is None else n_rows) <= _TASK_PATH_MAX_ROWS:
        return ds.map_batches(
            lambda b, _c=cls, _a=ctor_args: _c(*_a)(b),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        cls,
        fn_constructor_args=ctor_args,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 16),
    )


def synth_media(sf_dir: str) -> ray.data.Dataset:
    """Deterministic binary media table derived from documents.

    In a real deployment the media table is an INPUT users read; the
    synthesizer stands in for it, so it materializes ONCE per sf_dir to
    partitioned parquet under /tmp (atomic rename, resumable) and every
    media query reads that — the queries measure decode/feature work,
    not repeated encoding. The encode itself fans the tiny doc_id block
    out to all cores (ids are int64s; the payload encoding is the cost).
    """
    import hashlib
    import os

    tag = hashlib.sha1(f"{sf_dir}|synth-media-v1".encode()).hexdigest()[:8]
    root = f"/tmp/dedupe_rust_ray_media_{tag}"
    if not os.path.isdir(root):
        tmp = f"{root}.tmp-{os.getpid()}"
        (
            read(sf_dir, "documents", columns=["doc_id"])
            .repartition(32)
            .map_batches(synth_media_batch, batch_format="pyarrow")
            .write_parquet(tmp)
        )
        try:
            os.rename(tmp, root)
        except OSError:  # lost a concurrent-build race: theirs is complete
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    from ..sources.storage import read_table

    return read_table(root)


def media_dims_census(sf_dir: str) -> ray.data.Dataset:
    """(fmt, width, height) -> count, sorted by count desc then key asc
    (the reference's census sort, /root/reference/src/main.rs:179-182)."""
    return canonical_sort(
        synth_media(sf_dir)
        .map_batches(probe_dims_batch, batch_format="pyarrow")
        .groupby(["fmt", "width", "height"])
        .aggregate(Count(alias_name="n")),
        ["n", "fmt", "width", "height"],
        descending=[True, False, False, False],
    )


def media_features(sf_dir: str) -> ray.data.Dataset:
    """Decode stage output (actor pool; BMP/PNG/GIF decode real pixels,
    JPEG rows carry per-row error flags). Returns (media_id, fmt, ok, err,
    width, height, mean_brightness) sorted by media_id; thumbs dropped
    from the query result to keep the driver comparison compact."""
    out = _payload_stage(synth_media(sf_dir), MediaDecode)
    return canonical_sort(
        out.select_columns(
            ["media_id", "fmt", "ok", "err", "width", "height",
             "mean_brightness"]
        ),
        ["media_id"],
    )


def media_decode_summary(sf_dir: str) -> ray.data.Dataset:
    """Per-(format, outcome) decode census. All four synthesized formats
    decode for real (stages/multimodal + stages/jpeg), so the SQL oracle
    — which derives the expected (fmt, 'ok', n) census from the
    deterministic doc_id -> fmt mapping — value-checks the entire
    synth -> encode -> sniff -> decode path for every codec."""
    feats = _payload_stage(synth_media(sf_dir), MediaDecode)

    def per_batch(batch: pa.Table) -> pa.Table:
        df = batch.select(["fmt", "err"]).to_pandas()
        df["outcome"] = df["err"].where(df["err"] != "", "ok")
        g = df.groupby(["fmt", "outcome"], as_index=False).size()
        return pa.table(
            {
                "fmt": pa.array(g["fmt"], type=pa.string()),
                "outcome": pa.array(g["outcome"], type=pa.string()),
                "partial": pa.array(g["size"].to_numpy(np.int64)),
            }
        )

    return canonical_sort(
        feats.map_batches(per_batch, batch_format="pyarrow")
        .groupby(["fmt", "outcome"])
        .aggregate(Sum("partial", alias_name="n")),
        ["fmt", "outcome"],
    )


def media_thumbnails(sf_dir: str) -> ray.data.Dataset:
    """Actor-pool resize stage: decode -> 16x16 block-mean -> PNG.

    Returns (media_id, fmt, err, thumb_bytes) sorted by media_id; the
    thumbnail payload itself is summarized as its byte length so the
    driver comparison stays compact."""
    from ..stages.multimodal import MediaResize

    out = _payload_stage(synth_media(sf_dir), MediaResize)

    def summarize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "err": batch["err"],
                "thumb_bytes": pc.binary_length(batch["thumb_png"]),
            }
        )

    return canonical_sort(
        out.map_batches(summarize, batch_format="pyarrow"), ["media_id"]
    )


def video_frame_sample(sf_dir: str, every_n: int = 10) -> ray.data.Dataset:
    """Frame-sampling over opaque 'video' payloads (synthetic decoder —
    the sandbox has no codec libraries; the Ray plumbing is real).
    One output row per sampled frame."""
    from ..stages.multimodal import VideoFrameSample

    frames = _payload_stage(synth_media(sf_dir), VideoFrameSample, every_n)

    def summarize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame_idx": batch["frame_idx"],
                "decoder": batch["decoder"],
                "frame_bytes": pc.binary_length(batch["frame"]),
            }
        )

    return canonical_sort(
        frames.map_batches(summarize, batch_format="pyarrow"),
        ["media_id", "frame_idx"],
    )


def synth_audio(sf_dir: str) -> ray.data.Dataset:
    """Deterministic WAV payload table derived from documents (same
    fan-out-then-encode shape as :func:`synth_media`)."""
    from ..stages.audio import synth_audio_batch

    return (
        read(sf_dir, "documents", columns=["doc_id"])
        .repartition(32)
        .map_batches(synth_audio_batch, batch_format="pyarrow")
    )


def audio_features(sf_dir: str) -> ray.data.Dataset:
    """Decode WAV payloads (actor pool) and measure duration + dominant
    frequency from the samples. The synthesis plants an exact-bin tone, so
    the MEASURED FFT peak must reproduce the closed-form planted value —
    the SQL oracle checks the whole synth -> RIFF encode -> parse -> FFT
    path end-to-end. rms / zcr (not closed-form) are covered by pytest."""
    from ..stages.audio import AudioFeatures

    return canonical_sort(
        _payload_stage(
            synth_audio(sf_dir), AudioFeatures, n_rows=_doc_rows(sf_dir)
        ).select_columns(
            ["media_id", "n_samples", "duration_ms", "dom_freq_hz"]
        ),
        ["media_id"],
    )


# ------------------------------------------------------------------
# planted-truth variants (the corpus_planted_truth / planted_flat_docs
# trick applied to the media family): corpora whose DECODED properties
# are closed-form in doc_id arithmetic, run through the UNCHANGED
# production stages (MediaDecode / MediaResize / MediaPhash /
# VideoFrameSample), so each gets a real SQL value oracle.
# ------------------------------------------------------------------

_PLANTED_MEDIA_OFFSET = 1_000_000_000
# the four LOSSLESS synthesized codecs: solid-gray payloads round-trip
# their pixel value exactly (PNG/BMP bytes, GIF identity gray palette,
# VP8L lossless). JPEG (T.81, quantized DC) is excluded from the
# solid-color truth and covered by the byte-identity pHash plant below.
_LOSSLESS_FORMATS = ("png", "bmp", "gif", "webp")


def planted_solid_media(sf_dir: str) -> ray.data.Dataset:
    """Planted media table: one SOLID-GRAY image per document.

    fmt cycles the four lossless codecs (``doc_id % 4``), dims cycle the
    stage's dimension choices (``(doc_id // 4) % 5``), and every pixel is
    ``(doc_id * 37) % 256`` — so width/height/mean_brightness (and the
    thumbnail mean after block-mean resize, which preserves solids
    exactly) are all closed-form in doc_id arithmetic while the real
    encoders and the real decode stages run end-to-end."""
    from ..stages.multimodal import (
        _DIM_CHOICES,
        encode_bmp,
        encode_gif,
        encode_png,
        encode_webp,
    )

    encoders = {
        "png": encode_png,
        "bmp": encode_bmp,
        "gif": encode_gif,
        "webp": encode_webp,
    }

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        media_ids, fmts, payloads = [], [], []
        for d in ids:
            d = int(d)
            fmt = _LOSSLESS_FORMATS[d % len(_LOSSLESS_FORMATS)]
            w, h = _DIM_CHOICES[(d // len(_LOSSLESS_FORMATS)) % len(_DIM_CHOICES)]
            color = (d * 37) % 256
            data = encoders[fmt](np.full((h, w), color, np.uint8))
            media_ids.append(f"m-{d:09d}")
            fmts.append(fmt)
            payloads.append(data)
        return pa.table(
            {
                "media_id": pa.array(media_ids, type=pa.string()),
                "fmt": pa.array(fmts, type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )


def media_features_planted(sf_dir: str) -> ray.data.Dataset:
    """:func:`media_features` (same MediaDecode stage) over the planted
    solid-gray corpus — width/height/mean_brightness closed-form."""
    out = _payload_stage(
        planted_solid_media(sf_dir), MediaDecode, n_rows=_doc_rows(sf_dir)
    )
    return canonical_sort(
        out.select_columns(
            ["media_id", "fmt", "ok", "err", "width", "height",
             "mean_brightness"]
        ),
        ["media_id"],
    )


def media_thumbnails_planted(sf_dir: str) -> ray.data.Dataset:
    """:func:`media_thumbnails` (same MediaResize stage) over the planted
    solid corpus, summarized as the DECODED thumbnail's mean — block-mean
    resize preserves solids exactly, so thumb_mean == the planted color
    and the oracle value-checks decode -> resize -> re-encode -> decode."""
    from ..stages.multimodal import MediaResize, decode_png

    out = _payload_stage(
        planted_solid_media(sf_dir), MediaResize, n_rows=_doc_rows(sf_dir)
    )

    def summarize(batch: pa.Table) -> pa.Table:
        means = []
        for p in batch["thumb_png"].to_pylist():
            img = decode_png(p) if p else None
            means.append(round(float(img.mean()), 4) if img is not None else -1.0)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "fmt": batch["fmt"],
                "err": batch["err"],
                "thumb_mean": pa.array(means, type=pa.float64()),
            }
        )

    return canonical_sort(
        out.map_batches(summarize, batch_format="pyarrow"),
        ["media_id"],
    )


def planted_dup_media(sf_dir: str, dup_every: int = 10) -> ray.data.Dataset:
    """Planted media table for the pHash pair truth: the production
    noise corpus (per-doc seeded pixels, ALL FIVE codecs incl. JPEG) plus
    a BYTE-IDENTICAL companion at ``doc_id + offset`` for every
    ``dup_every``-th doc. Identical payloads decode to identical pixels
    -> identical pHash in any container, while distinct-seed noise images
    land on distinct 64-bit pHashes (deterministic per sf; verified by
    the sweep — same determinism argument as planted_flat_docs)."""
    from ..stages.multimodal import synth_media_batch

    def synth(batch: pa.Table) -> pa.Table:
        base = synth_media_batch(batch)
        ids = batch["doc_id"].to_numpy()
        keep = [i for i in range(len(ids)) if int(ids[i]) % dup_every == 0]
        dup = base.take(keep)
        dup_ids = pa.array(
            [f"m-{int(ids[i]) + _PLANTED_MEDIA_OFFSET:09d}" for i in keep],
            type=pa.string(),
        )
        dup = dup.set_column(dup.schema.get_field_index("media_id"),
                             "media_id", dup_ids)
        return pa.concat_tables([base, dup])

    return read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )


def media_phash_planted(sf_dir: str, dup_every: int = 10) -> ray.data.Dataset:
    """Equal-pHash pair set over the planted dup corpus — the SAME
    MediaPhash stage (real decode of all five codecs -> shared grid fit
    -> DCT pHash), then the standard identical-key pair shape: groupby
    phash, emit ordered pairs inside each group (identical-hash groups
    are bounded — the exact-dup group shape, not an all-pairs join).
    Expected pairs are closed-form: (m-{d}, m-{d+offset}) for
    d % dup_every == 0."""
    from ..stages.multimodal import MediaPhash

    n_docs = _doc_rows(sf_dir)
    hashed = _payload_stage(
        planted_dup_media(sf_dir, dup_every),
        MediaPhash,
        # base rows + one companion per dup_every-th doc
        n_rows=None if n_docs is None else n_docs + n_docs // dup_every + 1,
    )

    def pairs(g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        ids = sorted(g["media_id"])
        if len(ids) < 2:
            return pd.DataFrame({"media_a": [], "media_b": []}, dtype=str)
        return pd.DataFrame(
            [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]],
            columns=["media_a", "media_b"],
        )

    return canonical_sort(
        hashed.select_columns(["phash", "media_id"])
        .groupby("phash")
        .map_groups(pairs, batch_format="pandas"),
        ["media_a", "media_b"],
    )


def planted_video_media(sf_dir: str, max_frames: int = 40) -> ray.data.Dataset:
    """Planted opaque 'video' table: payload LENGTH is closed-form
    (``256 * (1 + doc_id % max_frames)`` bytes), so the synthetic
    demuxer's frame count — ``len(payload) // 256`` — and the sampled
    frame indices are SQL-derivable while the real explode stage runs."""

    def synth(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        media_ids, payloads = [], []
        for d in ids:
            d = int(d)
            media_ids.append(f"m-{d:09d}")
            payloads.append(bytes(256 * (1 + d % max_frames)))
        return pa.table(
            {
                "media_id": pa.array(media_ids, type=pa.string()),
                "fmt": pa.array(["video"] * len(media_ids), type=pa.string()),
                "payload": pa.array(payloads, type=pa.binary()),
            }
        )

    return read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        synth, batch_format="pyarrow"
    )


def video_frame_sample_planted(
    sf_dir: str, every_n: int = 10, max_frames: int = 40
) -> ray.data.Dataset:
    """:func:`video_frame_sample` (same VideoFrameSample stage) over the
    planted closed-form-length payloads: one row per sampled frame with
    frame_idx in {0, every_n, ...} below the closed-form frame count and
    frame_bytes = 16*16*4 exactly."""
    from ..stages.multimodal import VideoFrameSample

    frames = _payload_stage(
        planted_video_media(sf_dir, max_frames),
        VideoFrameSample,
        every_n,
        n_rows=_doc_rows(sf_dir),
    )

    def summarize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "media_id": batch["media_id"],
                "frame_idx": batch["frame_idx"],
                "decoder": batch["decoder"],
                "frame_bytes": pc.cast(
                    pc.binary_length(batch["frame"]), pa.int64()
                ),
            }
        )

    return canonical_sort(
        frames.map_batches(summarize, batch_format="pyarrow"),
        ["media_id", "frame_idx"],
    )


def media_phash(sf_dir: str) -> ray.data.Dataset:
    """Per-media 64-bit perceptual hash (decode -> block-mean resize ->
    DCT pHash in an actor pool) — the feature column every image-dedup
    blocking scheme (ER flagship, multi-index Hamming) keys on.
    Returns (media_id, fmt, ok, err, phash) sorted by media_id."""
    from ..stages.multimodal import MediaPhash

    return canonical_sort(
        _payload_stage(synth_media(sf_dir), MediaPhash),
        ["media_id"],
    )
