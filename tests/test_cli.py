"""CLI surface tests (reference CLI parity: -d/--exclude flags,
src/main.rs:60-74; plus the generalized ER job entry)."""

import json

import numpy as np
import pyarrow.parquet as pq


def test_cli_filededupe(tmp_path, capsys, ray_session):
    from dedupe_rust_ray.__main__ import main
    from dedupe_rust_ray.stages.multimodal import encode_png

    imgs = tmp_path / "imgs"
    imgs.mkdir()
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    (imgs / "a.png").write_bytes(encode_png(px))
    (imgs / "b.png").write_bytes(encode_png(px))  # duplicate
    (imgs / "skipme").mkdir()
    (imgs / "skipme" / "c.png").write_bytes(encode_png(px))

    rc = main(
        ["filededupe", "-d", str(imgs), "--exclude", "skipme",
         "--out-dir", str(tmp_path)]
    )
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["total_files"] == 2
    assert out["files_in_duplicate_groups"] == 2
    assert out["unique_files"] == 1


def test_cli_er_job_and_resume(tmp_path, capsys, ray_session):
    from dedupe_rust_ray.__main__ import main
    from dedupe_rust_ray.sources.corpus import synth_corpus_table

    docs, _, _ = synth_corpus_table(60, seed=9)
    src = tmp_path / "docs.parquet"
    pq.write_table(docs, str(src))

    args = [
        "er", "--input", str(src), "--out", str(tmp_path / "out"),
        "--checkpoint-dir", str(tmp_path / "ckpt"),
    ]
    assert main(args) == 0
    m1 = json.loads(capsys.readouterr().out)
    assert m1["complete"] and m1["cluster_rows"] > 0

    # resume run reuses checkpoints and reproduces identical counts
    assert main(args + ["--resume"]) == 0
    m2 = json.loads(capsys.readouterr().out)
    assert (m1["cluster_rows"], m1["n_clusters"]) == (
        m2["cluster_rows"], m2["n_clusters"]
    )


def test_cli_probe_heic(tmp_path, capsys):
    import struct

    from dedupe_rust_ray.__main__ import main

    def box(tag, payload):
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    ispe = box(b"ispe", b"\x00" * 4 + struct.pack(">II", 640, 480))
    data = box(b"ftyp", b"heic" + b"\x00" * 4 + b"mif1") + box(
        b"meta", b"\x00" * 4 + box(b"iprp", box(b"ipco", ispe))
    )
    f = tmp_path / "t.heic"
    f.write_bytes(data)
    assert main(["probe", str(f)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert (out["format"], out["width"], out["height"]) == ("heic", 640, 480)
