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


def _payload_stage(ds, cls, *ctor_args, batch_size: int = 128):
    """Size-gated decode/feature stage: task dispatch below
    ``_TASK_PATH_MAX_ROWS``, actor pool (the scale path) above."""
    if ds.count() <= _TASK_PATH_MAX_ROWS:
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
        _payload_stage(synth_audio(sf_dir), AudioFeatures).select_columns(
            ["media_id", "n_samples", "duration_ms", "dom_freq_hz"]
        ),
        ["media_id"],
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
