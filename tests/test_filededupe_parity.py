"""F4 reference-semantics parity regression (FIXTURES.md F4, SURVEY §5.2.5):
an on-disk image tree exercising the reference's exact two-phase behavior —
byte-identical copies group; same pixels across extensions never group
(ext in block key AND deep hash, src/main.rs:376, 598-600); same ext with
different dims never compared (src/main.rs:376); hidden/excluded dirs
skipped (src/main.rs:139-152); sentinels; sort orders."""

import numpy as np
import pytest

from dedupe_rust_ray.pipelines.filededupe import (
    file_dedupe_groups,
    file_dedupe_results,
    list_image_files,
    quick_checksum,
)
from dedupe_rust_ray.stages.multimodal import encode_bmp, encode_png


def _pix(seed, shape=(16, 16)):
    return np.random.default_rng(seed).integers(0, 256, shape).astype(np.uint8)


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ftree")
    (root / "sub").mkdir()
    (root / "sub2").mkdir()
    (root / ".hidden").mkdir()
    (root / "excl").mkdir()

    a = encode_png(_pix(1))
    (root / "a.png").write_bytes(a)
    (root / "sub" / "a_copy.png").write_bytes(a)  # byte-identical dup
    (root / ".hidden" / "a_hidden.png").write_bytes(a)  # must be skipped
    (root / "excl" / "a_excl.png").write_bytes(a)  # excluded by name

    b = encode_bmp(_pix(2))
    (root / "b.bmp").write_bytes(b)
    (root / "sub2" / "b2.bmp").write_bytes(b)  # second dup group

    # same pixels, different extension -> NEVER duplicates
    (root / "c.png").write_bytes(encode_png(_pix(3)))
    (root / "c.bmp").write_bytes(encode_bmp(_pix(3)))

    # same extension, different dimensions -> never compared
    (root / "d1.png").write_bytes(encode_png(_pix(4, (16, 16))))
    (root / "d2.png").write_bytes(encode_png(_pix(4, (32, 32))))

    (root / "e.png").write_bytes(b"")  # empty file
    (root / "notes.txt").write_bytes(b"not an image")  # census only

    # the reference's own fixture shape: a tiny 2x2 image
    (root / "tiny.png").write_bytes(
        encode_png(np.array([[255, 0], [0, 255]], dtype=np.uint8))
    )
    return root


def test_scan_filters(tree):
    files, census = list_image_files(str(tree), exclude=("excl",))
    names = {f.split(str(tree) + "/")[-1] for f in files}
    assert "a.png" in names and "sub/a_copy.png" in names
    assert not any(".hidden" in n for n in names)
    assert not any(n.startswith("excl/") for n in names)
    assert census["txt"] == 1  # census counts unprocessed extensions too
    assert census["png"] >= 6


def test_duplicate_groups_exact_semantics(tree):
    groups, _ = file_dedupe_groups(str(tree), exclude=("excl",))
    by_group = {
        gid: sorted(g["path"]) for gid, g in groups.groupby("group_id")
    }
    sets = [
        tuple(p.split(str(tree) + "/")[-1] for p in v) for v in by_group.values()
    ]
    assert ("a.png", "sub/a_copy.png") in sets
    assert ("b.bmp", "sub2/b2.bmp") in sets
    assert len(sets) == 2  # nothing else groups
    # groups ordered by first member path, members lexicographic
    firsts = [v[0] for v in by_group.values()]
    assert firsts == sorted(firsts)


def test_results_json_shape(tree, tmp_path):
    res = file_dedupe_results(str(tree), exclude=("excl",), out_dir=str(tmp_path))
    assert res["total_groups"] == 2
    assert all(set(g) == {"files", "dimensions"} for g in res["groups"])
    assert res["groups"][0]["dimensions"] == "16x16"
    s = res["summary"]
    assert s["unique_files"] == s["total_files"] - (
        res["total_groups"] and len(sum((g["files"] for g in res["groups"]), []))
        - res["total_groups"]
    )
    import glob, json, os

    written = glob.glob(str(tmp_path / "dedupe_*.json"))
    assert len(written) == 1
    assert json.load(open(written[0]))["total_groups"] == 2


def test_quick_checksum_sentinels_and_mixing():
    assert quick_checksum(b"", 4, 4) == "EMPTY_FILE"
    # reference parity for short files: the fold runs over its whole
    # zero-initialized 3000-byte buffer, so "ab" hashes as one padded
    # chunk ('a'<<16 | 'b'<<8 | 0) + 999 zero chunks, times 1000
    expect = (((ord("a") << 16) | (ord("b") << 8)) * 1000) ^ ((4 << 32) | 4)
    assert quick_checksum(b"ab", 4, 4) == f"{expect:016x}"
    # zero-padding makes a short file hash equal its explicitly padded self
    assert quick_checksum(b"xyz", 2, 2) == quick_checksum(
        b"xyz" + b"\x00" * 2997, 2, 2
    )
    h1 = quick_checksum(b"abcdef" * 10, 4, 4)
    h2 = quick_checksum(b"abcdef" * 10, 4, 4)
    h3 = quick_checksum(b"abcdef" * 10, 8, 4)  # dims mixed into the hash
    assert h1 == h2 and h1 != h3 and len(h1) == 16
    # only the first 3000 bytes participate
    base = bytes(range(256)) * 12  # 3072 bytes
    assert quick_checksum(base, 1, 1) == quick_checksum(base[:3000] + b"XYZ", 1, 1)
