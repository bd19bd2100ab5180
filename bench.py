"""Bench harness (driver contract).

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N, "er_docs": N, "er_docs_per_sec": N}

``--scaling`` runs the ER headline twice in FRESH processes (num_cpus=8
then 32) on the same input and reports both throughputs + scaling
efficiency (the sandbox proxy for the north_rule's N vs 4N cluster sizes).
"""

from __future__ import annotations

import gc
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
ER_N_BASE = int(os.environ.get("GRAFT_ER_N_BASE", "30000"))
SKEW_N_BASE = int(os.environ.get("GRAFT_SKEW_N_BASE", "60000"))
SKEW_HOT_N = int(os.environ.get("GRAFT_SKEW_HOT_N", "60000"))
ONLY = os.environ.get("GRAFT_BENCH_ONLY", "all")  # "er" -> headline only
# best-of-N inside the suite: co-tenant load spikes on this host can
# swing any single wall-time up to 10x (see BENCH/BASELINE.md); the min
# of N runs is the least-noise estimate of the pipeline's actual cost
# (per-repeat numbers are emitted). Round 1's driver bench recorded a
# 2.2x-inflated ER number from exactly this noise — 3 repeats is cheap
# insurance.
REPEATS = int(os.environ.get("GRAFT_BENCH_REPEATS", "3"))


def _sample_peak_rss(stop, out: dict) -> None:
    """Background sampler: peak summed RSS of the bench driver plus every
    ``ray::`` worker process (0.5 s cadence). An approximation — shared
    object-store mappings count once per process that touches them — but
    it bounds the figure of interest from above: does the skewed hot
    block blow up any worker's heap."""
    page = os.sysconf("SC_PAGESIZE")
    me = str(os.getpid())
    while not stop.is_set():
        total = 0
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                if d != me:
                    with open(f"/proc/{d}/cmdline", "rb") as f:
                        if b"ray::" not in f.read():
                            continue
                with open(f"/proc/{d}/statm") as f:
                    total += int(f.read().split()[1]) * page
            except OSError:
                continue
        out["peak_rss_bytes"] = max(out.get("peak_rss_bytes", 0), total)
        stop.wait(0.5)


def _skew_endurance() -> dict:
    """Endurance run (VERDICT r4 item 7): the distributed ER pipeline over
    a corpus with ONE pathological hot block — SKEW_HOT_N byte-identical
    media-rich docs sharing a single content hash / pHash / LSH band set —
    with the distributed candidate path, distributed CC and hash-join
    scorer all FORCED (no fused/broadcast shortcuts). The guards under
    test at scale: the equal-content-hash pair skip, the exact-dup chain,
    and ``max_pairs_per_shard``. Reported: wall, docs/s, peak worker RSS."""
    import threading

    from dedupe_rust_ray.config import ERConfig
    from dedupe_rust_ray.pipelines.er import er_pipeline
    from dedupe_rust_ray.sources.corpus import synth_corpus_skewed

    corpus = synth_corpus_skewed(
        SKEW_N_BASE, SKEW_HOT_N, blocks=int(os.environ.get("GRAFT_ER_BLOCKS", "64"))
    ).materialize()
    n_docs = corpus.count()
    cfg = ERConfig(
        fused_band_rows_max=0,
        driver_unionfind_max_edges=0,
        broadcast_max_docs=0,
    )
    mem: dict = {}
    stop = threading.Event()
    t = threading.Thread(target=_sample_peak_rss, args=(stop, mem), daemon=True)
    t.start()
    gc.collect()
    t0 = time.time()
    clusters = er_pipeline(corpus, cfg)
    hot_rows = clusters.to_pandas()
    wall = round(time.time() - t0, 3)
    stop.set()
    t.join(timeout=2)
    hot = hot_rows[hot_rows["doc_id"].str.startswith("hot-")]
    return {
        "skew_docs": n_docs,
        "skew_hot_n": SKEW_HOT_N,
        "skew_wall_sec": wall,
        "skew_docs_per_sec": round(n_docs / wall, 1),
        "skew_hot_clusters": int(hot["cluster_id"].nunique()),
        "skew_hot_members": int(len(hot)),
        "skew_cluster_rows": int(len(hot_rows)),
        "skew_peak_rss_gb": round(mem.get("peak_rss_bytes", 0) / 2**30, 2),
    }


def _media_codec_cost() -> dict:
    """Per-codec decode cost table (VERDICT r4 stretch 10): the
    codec-compute-bound claim for media_features, made visible per format
    in the bench JSON instead of one blended wall. Each format's rows run
    through the SAME MediaDecode stage in isolation; rows/sec per codec
    shows where the per-image cost lives (pure-Python T.81/VP8L inner
    loops vs the numpy BMP/PNG/GIF paths)."""
    import pyarrow.compute as pc

    from dedupe_rust_ray.pipelines import multimodal

    media = multimodal.synth_media(SF_DIR).materialize()
    out = {}
    for fmt in ("png", "bmp", "gif", "jpeg", "webp"):
        sub = media.map_batches(
            lambda b, f=fmt: b.filter(pc.equal(b["fmt"], f)),
            batch_format="pyarrow",
        ).materialize()
        n = sub.count()
        gc.collect()
        t0 = time.time()
        multimodal._payload_stage(sub, multimodal.MediaDecode).count()
        dt = time.time() - t0
        out[fmt] = {
            "rows": n,
            "sec": round(dt, 3),
            "rows_per_sec": round(n / dt, 1) if dt else None,
        }
    return out


def _run_queries() -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=NUM_CPUS,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from dedupe_rust_ray.config import ERConfig
    from dedupe_rust_ray.pipelines import (
        analytics,
        curation,
        dedupe,
        multimodal,
        similarity,
        textpipe,
    )
    from dedupe_rust_ray.pipelines.er import er_pipeline
    from dedupe_rust_ray.sources.corpus import synth_corpus_distributed

    load_at_start = round(os.getloadavg()[0], 1)
    timings: dict[str, float] = {}
    repeats_detail: dict[str, list[float]] = {}
    extra: dict[str, float] = {}

    def timed(name, fn):
        runs = []
        n = 0
        for _ in range(REPEATS):
            gc.collect()  # see timed_suite: plan-graph cycles degrade repeats
            t0 = time.time()
            res = fn()
            n = len(res) if hasattr(res, "__len__") else res.count()
            runs.append(round(time.time() - t0, 3))
        timings[name] = min(runs)
        repeats_detail[name] = runs
        return n

    def timed_suite(named_fns):
        """Interleaved repeats: run the whole suite REPEATS times and take
        each query's min ACROSS passes. Back-to-back repeats of one query
        share the same co-tenant load window, so a single spike poisons
        all of them; spreading a query's repeats minutes apart gives the
        min a real chance to see a quiet window. Returns the last-pass
        result row count per query."""
        rowcounts: dict[str, int] = {}
        for name, _ in named_fns:
            repeats_detail[name] = []
        for _ in range(REPEATS):
            for name, fn in named_fns:
                # Dataset plan graphs hold reference cycles; without an
                # explicit collect the un-finalized executors/broadcast
                # refs of PRIOR runs degrade later ones (measured: the
                # same ER run drifts 4s -> 34s across 4 in-session
                # repeats, flat with per-repeat gc)
                gc.collect()
                t0 = time.time()
                res = fn()
                try:
                    rowcounts[name] = len(res)
                except (TypeError, AttributeError):
                    rowcounts[name] = res.count()  # distributed Dataset
                repeats_detail[name].append(round(time.time() - t0, 3))
        for name, _ in named_fns:
            timings[name] = min(repeats_detail[name])
        return rowcounts

    # warm the page cache so we measure compute+shuffle, not first disk read
    import pyarrow.parquet as pq

    for t in ("lineitem", "documents", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")

    # warm-up: a tiny ER run spins up worker processes / imports / actor
    # machinery so the timed run measures compute + shuffle, not cold start
    warm = synth_corpus_distributed(500, blocks=NUM_CPUS).materialize()
    er_pipeline(warm, ERConfig()).count()

    # headline: full ER pipeline over the distributed synthetic corpus
    # (media-rich — the reference is an image deduper; decode+pHash is the
    # dominant cost, which is also the compute-bound path that scales).
    # Block count is FIXED (not a function of num_cpus) so the scaling
    # comparison runs on byte-identical input layout at every level.
    corpus = synth_corpus_distributed(
        ER_N_BASE, blocks=int(os.environ.get("GRAFT_ER_BLOCKS", "64")),
        media_rich=True,
    ).materialize()
    n_docs = corpus.count()
    extra["er_docs"] = n_docs

    if ONLY == "er":
        er_runs = []
        n_clusters = 0
        for _ in range(REPEATS):
            gc.collect()  # see timed_suite: plan-graph cycles degrade repeats
            t0 = time.time()
            clusters = er_pipeline(corpus, ERConfig())
            n_clusters = clusters.count()
            er_runs.append(round(time.time() - t0, 3))
        er_sec = min(er_runs)
        timings["er_pipeline"] = er_sec
        repeats_detail["er_pipeline"] = er_runs
        extra["er_cluster_rows"] = n_clusters
        extra["er_docs_per_sec"] = round(n_docs / er_sec, 1)
        total = round(sum(timings.values()), 3)
        return {
            "metric": "pipeline_suite_sec",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "repeats": repeats_detail,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "loadavg_before": load_at_start,
            "loadavg_after": round(os.getloadavg()[0], 1),
            **extra,
        }

    # er_pipeline rides the interleaved suite too: its repeats land
    # minutes apart, so one co-tenant spike cannot poison all of them
    rowcounts = timed_suite(
        [
            ("er_pipeline", lambda: er_pipeline(corpus, ERConfig())),
            ("q1_pricing_summary", lambda: analytics.q1_pricing_summary(SF_DIR).to_pandas()),
            ("events_hourly", lambda: analytics.events_hourly(SF_DIR).to_pandas()),
            ("exact_dedup_first", lambda: analytics.exact_dedup_first(SF_DIR).to_pandas()),
            ("minhash_lsh_dedup", lambda: dedupe.minhash_lsh_dedup(SF_DIR).to_pandas()),
            ("embedding_cosine_pairs", lambda: dedupe.embedding_cosine_pairs(SF_DIR)),
            ("knn_topk", lambda: similarity.knn_topk(SF_DIR)),
            ("media_features", lambda: multimodal.media_features(SF_DIR).to_pandas()),
        ]
    )
    extra["er_cluster_rows"] = rowcounts["er_pipeline"]
    extra["er_docs_per_sec"] = round(n_docs / timings["er_pipeline"], 1)

    # round-3 rewrite/search operators, timed once each OUTSIDE the
    # comparable suite metric (so `value` stays r1/r2-comparable)
    extras_t = {}
    for name, fn in (
        ("dedup_lines", lambda: curation.dedup_lines(SF_DIR).count()),
        ("dedup_spans", lambda: curation.dedup_spans(SF_DIR).count()),
        ("bm25_search", lambda: textpipe.bm25_search(SF_DIR).count()),
        ("mixture_schedule", lambda: curation.mixture_schedule(SF_DIR).count()),
    ):
        gc.collect()
        t0 = time.time()
        fn()
        extras_t[name] = round(time.time() - t0, 3)
    extra["extra_queries"] = extras_t

    # skew endurance (outside the comparable suite metric): hot-block
    # corpus through the fully-distributed pipeline, wall + peak RSS
    if os.environ.get("GRAFT_BENCH_SKEW", "1") == "1":
        extra["skew_endurance"] = _skew_endurance()

    # per-codec decode cost (outside the comparable suite metric)
    if os.environ.get("GRAFT_BENCH_CODEC", "1") == "1":
        extra["media_codec_cost"] = _media_codec_cost()

    total = round(sum(timings.values()), 3)
    return {
        "metric": "pipeline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "repeats": repeats_detail,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        # co-tenant load on this host swings wall times up to 10x (see
        # BENCH/BASELINE.md); the loadavg pair marks which runs are quiet
        "loadavg_before": load_at_start,
        "loadavg_after": round(os.getloadavg()[0], 1),
        **extra,
    }


def _scaling() -> None:
    def run(ncpu: int) -> dict:
        # 360k-base corpus (~468k docs): large enough that fixed per-run
        # costs (scheduling, broadcast, driver CC) amortize — the regime a
        # real multi-node job runs in. At 120k docs fixed costs eat ~30%
        # of the 32-CPU wall and the efficiency number measures overhead,
        # not the pipeline.
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_ONLY="er",
            GRAFT_ER_N_BASE=os.environ.get("GRAFT_ER_N_BASE", "360000"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    def loadavg() -> float:
        return round(os.getloadavg()[0], 1)

    # levels overridable (N vs 4N): the host's memory subsystem saturates
    # between 8 and 32 streaming workers (aggregate numpy throughput
    # 8 -> 32 procs is only 1.61x, a 0.40 ceiling for bandwidth-bound
    # work — see BASELINE.md), so a lower pair isolates the pipeline's
    # own scaling from the single-host bandwidth wall
    lo = int(os.environ.get("GRAFT_SCALING_LO", "8"))
    hi = int(os.environ.get("GRAFT_SCALING_HI", "32"))
    repeats = int(os.environ.get("GRAFT_SCALING_REPEATS", "1"))
    # best-of-N per level (interleaved lo/hi so co-tenant load spikes hit
    # both levels alike): the sandbox host shows loadavg spikes from
    # OUTSIDE the container that can double any single wall-time
    load_before = loadavg()
    runs_lo, runs_hi = [], []
    for _ in range(repeats):
        runs_lo.append(run(lo))
        runs_hi.append(run(hi))
    r_lo = max(runs_lo, key=lambda r: r["er_docs_per_sec"])
    r_hi = max(runs_hi, key=lambda r: r["er_docs_per_sec"])
    tput_lo = r_lo["er_docs_per_sec"]
    tput_hi = r_hi["er_docs_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "cpus_lo": lo,
                "cpus_hi": hi,
                "er_docs_per_sec_lo": tput_lo,
                "er_docs_per_sec_hi": tput_hi,
                "er_docs_per_sec_lo_runs": [r["er_docs_per_sec"] for r in runs_lo],
                "er_docs_per_sec_hi_runs": [r["er_docs_per_sec"] for r in runs_hi],
                "er_sec_lo": r_lo["queries"]["er_pipeline"],
                "er_sec_hi": r_hi["queries"]["er_pipeline"],
                "loadavg_before": load_before,
                "loadavg_after": loadavg(),
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        _scaling()
    elif "--skew" in sys.argv:
        import ray

        if not ray.is_initialized():
            ray.init(
                address="local",
                num_cpus=NUM_CPUS,
                include_dashboard=False,
                logging_level="ERROR",
            )
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        res = _skew_endurance()
        res.update({"metric": "skew_endurance", "num_cpus": NUM_CPUS})
        print(json.dumps(res))
        ray.shutdown()
    else:
        result = _run_queries()
        print(json.dumps(result))
        import ray

        ray.shutdown()
