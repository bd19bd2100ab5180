"""span_sequence_census (pipelines/analytics.py): registered-oracle
comparison, and violation DETECTION pins on hand-built corpora — the
operator must place out-of-order offsets and misplaced media spans in
order_ok=0 / media_last=0 census rows, not silently pass them."""

import importlib.util

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


def _entry_module():
    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_span_tests", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_span_sequence_matches_registered_oracle():
    mod = _entry_module()
    got = mod.queries()["span_sequence_census"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    want = con.sql(mod.oracle_sql()["span_sequence_census"]).df()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False,
    )
    # the invariant itself: EVERY document is in-order with trailing media
    assert (got["order_ok"] == 1).all() and (got["media_last"] == 1).all()


def _corpus(rows):
    from dedupe_rust_ray.sources.corpus import DOCS_SCHEMA

    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "doc_id": [r[0] for r in rows],
                "spans": [r[1] for r in rows],
            },
            schema=DOCS_SCHEMA,
        )
    )


def _span(kind, offset, text=""):
    return {
        "kind": kind,
        "text": text,
        "media_ref": "media://x" if kind == "media" else "",
        "offset": offset,
    }


@pytest.mark.parametrize(
    "spans, expect",
    [
        # well-formed: 2 text + trailing media
        (
            [_span("text", 0, "a"), _span("text", 1, "b"), _span("media", 2)],
            (2, 1, 1),
        ),
        # offsets swapped -> order_ok must drop to 0
        (
            [_span("text", 1, "a"), _span("text", 0, "b"), _span("media", 2)],
            (2, 0, 1),
        ),
        # media in the middle -> media_last must drop to 0
        (
            [_span("text", 0, "a"), _span("media", 1), _span("text", 2, "b")],
            (2, 1, 0),
        ),
        # two media spans -> media_last 0 even though one IS last
        (
            [_span("media", 0), _span("media", 1)],
            (0, 1, 0),
        ),
        # lone media doc (zero-length text) is valid
        ([_span("media", 0)], (0, 1, 1)),
    ],
)
def test_violation_detection(spans, expect):
    from dedupe_rust_ray.pipelines.analytics import span_sequence_census_of

    got = span_sequence_census_of(_corpus([("doc-x", spans)]))
    assert len(got) == 1
    row = got.iloc[0]
    assert (
        row["n_text_spans"],
        row["order_ok"],
        row["media_last"],
    ) == expect
    assert row["n_docs"] == 1


def test_mixed_corpus_census_rows():
    """One valid + one order-violated doc fold into two distinct census
    rows with the right counts."""
    from dedupe_rust_ray.pipelines.analytics import span_sequence_census_of

    ok = [_span("text", 0, "a"), _span("media", 1)]
    bad = [_span("text", 5, "a"), _span("media", 1)]
    got = span_sequence_census_of(
        _corpus([("d1", ok), ("d2", ok), ("d3", bad)])
    )
    recs = {
        (r.n_text_spans, r.order_ok, r.media_last): r.n_docs
        for r in got.itertuples()
    }
    assert recs == {(1, 1, 1): 2, (1, 0, 1): 1}
