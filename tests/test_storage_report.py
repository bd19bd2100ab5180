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
