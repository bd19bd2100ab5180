import pyarrow as pa
import ray.data

from dedupe_rust_ray.report import format_duration
from dedupe_rust_ray.sources.storage import read_table, storage_format, write_table


def test_format_duration_tiers():
    assert format_duration(12.345) == "12.35s"
    assert format_duration(125) == "2m 5s"
    assert format_duration(3700) == "1h 1m"


def test_storage_format_parquet_fallback():
    # pylance is not installable in this sandbox -> parquet fallback active
    assert storage_format() == "parquet"


def test_write_read_roundtrip(tmp_path):
    t = pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    ds = ray.data.from_arrow(t)
    out = str(tmp_path / "tbl")
    write_table(ds, out)
    back = read_table(out).to_pandas().sort_values("a", ignore_index=True)
    assert back["a"].tolist() == [1, 2, 3]
    assert back["b"].tolist() == ["x", "y", "z"]
    # column pruning at the read
    only_a = read_table(out, columns=["a"])
    assert only_a.schema().names == ["a"]


def test_storage_layer_roundtrip(tmp_path, ray_session):
    """write_table/read_table round-trip through the storage layer with
    the resumable directory-of-part-files layout (Parquet fallback here;
    the Lance path takes over transparently when pylance is importable)."""
    import os

    import pandas as pd
    import ray.data

    from dedupe_rust_ray.sources.storage import (
        read_table,
        storage_format,
        write_table,
    )

    assert storage_format() in ("lance", "parquet")
    df = pd.DataFrame(
        {"doc_id": [f"d{i}" for i in range(100)], "n": list(range(100))}
    )
    out = str(tmp_path / "t")
    write_table(ray.data.from_pandas(df).repartition(4), out)
    # resumable layout: a directory of part files, never one giant file
    assert os.path.isdir(out)
    parts = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(parts) >= 2

    back = read_table(out).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(
        back, df.sort_values("doc_id", ignore_index=True)
    )
    # column pruning pushed to the reader
    pruned = read_table(out, columns=["n"]).to_pandas()
    assert list(pruned.columns) == ["n"] and len(pruned) == 100


def test_storage_csv_jsonl_roundtrip(tmp_path):
    """Extension-dispatched CSV and JSONL read/write through the storage
    layer; columns= prunes after the scan for row-oriented formats."""
    import pandas as pd
    import ray.data

    df = pd.DataFrame({"k": [3, 1, 2], "s": ["c", "a", "b"], "v": [0.5, 1.5, 2.5]})
    ds = ray.data.from_pandas(df)

    csv_out = str(tmp_path / "t.csv")
    write_table(ds, csv_out)
    back = read_table(csv_out).to_pandas().sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(back, df.sort_values("k", ignore_index=True))
    pruned = read_table(csv_out, columns=["k"]).to_pandas()
    assert list(pruned.columns) == ["k"]

    js_out = str(tmp_path / "t.jsonl")
    write_table(ds, js_out, fmt="json")
    back = read_table(js_out).to_pandas().sort_values("k", ignore_index=True)
    pd.testing.assert_frame_equal(
        back[["k", "s", "v"]], df.sort_values("k", ignore_index=True)
    )
