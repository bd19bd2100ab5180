"""Multimodal pipelines: media synthesis, dims census, decode features.

``media_dims_census`` is the direct analog of the reference's blocking
census — group count by (extension, width, height)
(/root/reference/src/main.rs:365-435) — with dimensions probed from binary
headers, never trusted from metadata."""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from ..stages.multimodal import MediaDecode, probe_dims_batch, synth_media_batch
from .common import read


def synth_media(sf_dir: str) -> ray.data.Dataset:
    """Deterministic binary media table derived from documents (streaming)."""
    return read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        synth_media_batch, batch_format="pyarrow"
    )


def media_dims_census(sf_dir: str) -> ray.data.Dataset:
    """(fmt, width, height) -> count, sorted by count desc then key asc
    (the reference's census sort, /root/reference/src/main.rs:179-182)."""
    return (
        synth_media(sf_dir)
        .map_batches(probe_dims_batch, batch_format="pyarrow")
        .groupby(["fmt", "width", "height"])
        .aggregate(Count(alias_name="n"))
        .sort(["n", "fmt", "width", "height"], descending=[True, False, False, False])
    )


def media_features(sf_dir: str) -> ray.data.Dataset:
    """Decode stage output (actor pool; BMP/PNG/GIF decode real pixels,
    JPEG rows carry per-row error flags). Returns (media_id, fmt, ok, err,
    width, height, mean_brightness) sorted by media_id; thumbs dropped
    from the query result to keep the driver comparison compact."""
    out = synth_media(sf_dir).map_batches(
        MediaDecode,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 8),
    )
    return out.select_columns(
        ["media_id", "fmt", "ok", "err", "width", "height", "mean_brightness"]
    ).sort("media_id")


def media_decode_summary(sf_dir: str) -> ray.data.Dataset:
    """Per-format decode outcome census (ok/err counts + mean brightness)."""
    feats = synth_media(sf_dir).map_batches(
        MediaDecode, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def per_batch(batch: pa.Table) -> pa.Table:
        df = batch.select(["err", "ok", "mean_brightness"]).to_pandas()
        df["fmt_err"] = df["err"].where(df["err"] != "", "ok")
        g = df.groupby("fmt_err", as_index=False).agg(
            n=("ok", "size"), sum_brightness=("mean_brightness", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        feats.map_batches(per_batch, batch_format="pyarrow")
        .groupby("fmt_err")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_brightness", alias_name="sum_brightness"),
        )
        .sort("fmt_err")
    )
