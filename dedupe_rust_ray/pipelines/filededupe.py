"""Reference-parity file dedupe: the reference's EXACT pipeline semantics
over an on-disk image tree, re-expressed on Ray Data.

Reproduces, operator for operator (SURVEY.md §2 S1-S5, M2-M7, H1, H4,
G1-G6, O1-O5; citations inline):

  walk -> whitelist/hidden/exclude filters -> dims probe ->
  block by (ext, w, h) -> quick checksum -> candidate groups ->
  deep content hash -> duplicate groups -> sorted output + JSON results

Semantics notes vs /root/reference:
- the quick checksum reproduces the reference algorithm from its spec
  (src/main.rs:520-572): first 3,000 raw file bytes (format header
  included), consecutive 3-byte chunks packed as 24-bit ints, wrapping
  sum, mixed as ``sum *wrap n_chunks ^ ((w as u64) << 32 | h)``, 16-hex;
  sentinels "EMPTY_FILE" (src/main.rs:536-538) and "NO_VALID_PIXELS"
  (src/main.rs:562-564);
- the deep hash covers extension + FULL FILE BYTES where the reference
  hashes extension + decoded pixel bytes (src/main.rs:593-603). The two
  diverge only for byte-different same-pixel encodings whose quick
  checksums also collide — such pairs never reach the deep phase in the
  reference either (phase-1 prunes them), so group outputs agree;
- member paths sorted lexicographically (src/main.rs:630), groups sorted
  by first member (src/main.rs:310-315), singleton groups pruned
  (src/main.rs:418-421, 610-613).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..functions.hashing import stable_hash64
from ..stages.dims import probe_dims

PROCESSED_EXTENSIONS = ("bmp", "jpg", "jpeg", "png", "gif", "webp")
# reference whitelist src/main.rs:129 (heic/heif deliberately commented out)


def list_image_files(
    root: str, exclude: tuple[str, ...] = ()
) -> tuple[list[str], dict[str, int]]:
    """Step 1 — recursive scan (src/main.rs:127-205), driver-side metadata
    walk (at petabyte scale the listing comes from a storage manifest):

    - hidden entries (name starts '.') skipped at any level
      (src/main.rs:139-142);
    - excluded folder names skipped at any path component
      (src/main.rs:145-152);
    - files only, whitelisted extensions (src/main.rs:157, 161-163);
    - extension census counts EVERY file seen, including unprocessed
      extensions (src/main.rs:165-166, 171-202)."""
    files: list[str] = []
    census: dict[str, int] = {}
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [
            d for d in dirnames if not d.startswith(".") and d not in exclude
        ]
        for name in sorted(filenames):
            if name.startswith("."):
                continue
            ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
            census[ext] = census.get(ext, 0) + 1
            if ext in PROCESSED_EXTENSIONS:
                files.append(os.path.join(dirpath, name))
    return sorted(files), census


def quick_checksum(data: bytes, width: int, height: int) -> str:
    """H1 — the reference's prefix checksum, bit-faithful
    (src/main.rs:520-572).

    The reference reads into a zero-initialized 3000-byte buffer and then
    folds over the WHOLE buffer: short files are effectively zero-padded,
    every 3-byte chunk counts as valid, and the multiplier is always 1000.
    Its NO_VALID_PIXELS branch is therefore unreachable for any non-empty
    file (kept here as documentation of that quirk, not as live code)."""
    if len(data) == 0:
        return "EMPTY_FILE"
    prefix = np.zeros(3000, dtype=np.uint8)
    head = np.frombuffer(data[:3000], dtype=np.uint8)
    prefix[: len(head)] = head
    chunks = prefix.reshape(-1, 3).astype(np.uint64)
    packed = (chunks[:, 0] << np.uint64(16)) | (chunks[:, 1] << np.uint64(8)) | chunks[:, 2]
    with np.errstate(over="ignore"):
        total = np.add.reduce(packed)  # uint64 wrapping sum
        final = (total * np.uint64(1000)) ^ (
            (np.uint64(width) << np.uint64(32)) | np.uint64(height)
        )
    return f"{int(final):016x}"


def _file_meta_batch(batch: pa.Table) -> pa.Table:
    """M1-M7 + H1 fused: extension, header dims, quick checksum per file."""
    paths = batch["path"].to_pylist()
    blobs = batch["bytes"].to_pylist()
    exts, ws, hs, quicks = [], [], [], []
    for p, data in zip(paths, blobs):
        ext = p.rsplit(".", 1)[-1].lower()
        if ext == "jpg":
            probe_ext = "jpeg"
        else:
            probe_ext = ext
        wh = probe_dims(probe_ext, data)
        w, h = wh if wh else (0, 0)
        exts.append(ext)
        ws.append(w)
        hs.append(h)
        quicks.append(quick_checksum(data, w, h))
    deep_src = [
        e.encode() + b"\x00" + d for e, d in zip(exts, blobs)
    ]  # ext participates in the deep hash (src/main.rs:598-600)
    deep = [f"{int(h):016x}" for h in stable_hash64([s.hex() for s in deep_src])]
    return pa.table(
        {
            "path": batch["path"],
            "ext": pa.array(exts, type=pa.string()),
            "width": pa.array(ws, type=pa.int32()),
            "height": pa.array(hs, type=pa.int32()),
            "quick": pa.array(quicks, type=pa.string()),
            "deep": pa.array(deep, type=pa.string()),
        }
    )


def file_dedupe_groups(
    root: str, exclude: tuple[str, ...] = ()
) -> tuple[pd.DataFrame, dict[str, int]]:
    """Full reference pipeline -> (groups df, extension census).

    groups df: one row per file in a duplicate group, columns
    (group_id:int ordinal after final sort, path, ext, width, height).
    """
    files, census = list_image_files(root, exclude)
    if not files:
        return (
            pd.DataFrame(columns=["group_id", "path", "ext", "width", "height"]),
            census,
        )
    ds = ray.data.read_binary_files(files, include_paths=True)
    meta = ds.map_batches(_file_meta_batch, batch_format="pyarrow")

    def groups_in_block(g: pd.DataFrame) -> pd.DataFrame:
        # G2 blocking (ext,w,h) -> G3 quick groups >=2 (src/main.rs:488-498)
        # -> G4 deep groups >=2 (src/main.rs:616-624); equality semantics,
        # so grouping within the pandas shard is exact. Files whose header
        # dims can't be parsed never enter a block (the reference's
        # dimension probe returns None for them).
        g = g[(g["width"] > 0) & (g["height"] > 0)]
        out = []
        for (ext, w, h, _q, _d), grp in g.groupby(
            ["ext", "width", "height", "quick", "deep"], sort=True
        ):
            if len(grp) < 2:
                continue  # singleton pruning (src/main.rs:418-421, 610-613)
            paths = sorted(grp["path"])  # member sort (src/main.rs:630)
            out.append(
                pd.DataFrame(
                    {
                        "path": paths,
                        "ext": ext,
                        "width": w,
                        "height": h,
                        "first_path": paths[0],
                    }
                )
            )
        if not out:
            return pd.DataFrame(
                {
                    "path": pd.Series(dtype=object),
                    "ext": pd.Series(dtype=object),
                    "width": pd.Series(dtype="int32"),
                    "height": pd.Series(dtype="int32"),
                    "first_path": pd.Series(dtype=object),
                }
            )
        return pd.concat(out, ignore_index=True)

    def add_shard(batch: pa.Table) -> pa.Table:
        key = [
            f"{e}:{w}x{h}"
            for e, w, h in zip(
                batch["ext"].to_pylist(),
                batch["width"].to_pylist(),
                batch["height"].to_pylist(),
            )
        ]
        shard = (stable_hash64(key) % np.uint64(16)).astype(np.int32)
        return batch.append_column("shard", pa.array(shard, type=pa.int32()))

    grouped = (
        meta.map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(
            lambda g: groups_in_block(g.drop(columns=["shard"])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    if not len(grouped):
        return (
            pd.DataFrame(columns=["group_id", "path", "ext", "width", "height"]),
            census,
        )
    # final group order: by first member path (src/main.rs:310-315)
    grouped = grouped.sort_values(["first_path", "path"], ignore_index=True)
    grouped["group_id"] = (
        (grouped["first_path"] != grouped["first_path"].shift()).cumsum() - 1
    )
    return grouped[["group_id", "path", "ext", "width", "height"]], census


def synth_file_tree(sf_dir: str, root: str) -> None:
    """Deterministic on-disk image tree derived from the driver's documents
    table: one encoded file per doc (format cycling png/bmp/gif/jpeg/webp),
    every 7th doc also written as a byte-identical copy under ``dups/`` — the F4
    parity corpus generator, synthesized with this repo's own encoders
    (the reference ships a checked-in fixture instead,
    /root/reference/test_images/create_test_image.rs)."""
    import pyarrow.parquet as pq

    from ..stages.multimodal import synth_media_batch

    os.makedirs(os.path.join(root, "dups"), exist_ok=True)
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    media = synth_media_batch(t)
    fmt_ext = {"jpeg": "jpg", "png": "png", "bmp": "bmp", "gif": "gif", "webp": "webp"}
    for mid, fmt, payload in zip(
        media["media_id"].to_pylist(),
        media["fmt"].to_pylist(),
        media["payload"].to_pylist(),
    ):
        ext = fmt_ext[fmt]
        base = os.path.join(root, f"{mid}.{ext}")
        with open(base, "wb") as f:
            f.write(payload)
        idx = int(mid.split("-")[1])
        if idx % 7 == 0:
            with open(os.path.join(root, "dups", f"{mid}-copy.{ext}"), "wb") as f:
                f.write(payload)


def file_dedupe_query(sf_dir: str) -> pd.DataFrame:
    """queries() entry: synthesize the deterministic tree under /tmp (once
    per sf_dir) and run the reference-parity pipeline over it."""
    import hashlib

    # the tag carries a generator version: a cached tree written by an
    # older synth (e.g. pre-webp 4-format rotation) must not satisfy the
    # marker check, or the parity pipeline silently runs on stale input
    tag = hashlib.sha1(f"{sf_dir}|v2-webp".encode()).hexdigest()[:8]
    root = f"/tmp/dedupe_rust_ray_files_{tag}"
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):
        synth_file_tree(sf_dir, root)
        open(marker, "w").close()
    groups, _ = file_dedupe_groups(root)
    groups = groups.copy()
    groups["path"] = groups["path"].str.replace(root + "/", "", regex=False)
    # pinned dtypes: the tree is a pure function of doc_id, so the driver
    # value-checks this result against closed-form SQL over `documents`
    # (every 7th doc has one byte-identical copy under dups/; member and
    # group order are lexicographic on the zero-padded media id)
    return groups.astype(
        {"group_id": "int64", "width": "int32", "height": "int32"}
    )


def file_dedupe_results(
    root: str, exclude: tuple[str, ...] = (), out_dir: str | None = None
) -> dict:
    """S4/S5 — the reference's Results JSON + summary statistics
    (src/main.rs:282-362): groups with files + "WxH" dimensions string,
    total_groups, execution_time; summary total/unique/dup counts
    (unique = total - (in_groups - n_groups), src/main.rs:353-354)."""
    t0 = time.time()
    groups, census = file_dedupe_groups(root, exclude)
    total_files = sum(
        n for e, n in census.items() if e in PROCESSED_EXTENSIONS
    )
    n_groups = groups["group_id"].nunique() if len(groups) else 0
    in_groups = len(groups)
    results = {
        "groups": [
            {
                "files": g["path"].tolist(),
                "dimensions": f"{g['width'].iloc[0]}x{g['height'].iloc[0]}",
            }
            for _, g in groups.groupby("group_id", sort=True)
        ],
        "total_groups": n_groups,
        "execution_time": f"{time.time() - t0:.2f}s",
        "summary": {
            "total_files": total_files,
            "files_in_duplicate_groups": in_groups,
            "unique_files": total_files - (in_groups - n_groups),
            "extension_census": dict(sorted(census.items())),
        },
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        name = f"dedupe_{time.strftime('%Y%m%d_%H%M%S')}.json"
        with open(os.path.join(out_dir, name), "w") as f:
            json.dump(results, f, indent=2)  # pretty-print (src/main.rs:339)
    return results
