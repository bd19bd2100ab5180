"""CLI entry points — the user-facing surface mirroring the reference's
argument set (`-d/--directory`, `-b/--batch_size`, repeatable `--exclude`;
/root/reference/src/main.rs:60-74) plus the generalized ER job.

    python -m dedupe_rust_ray filededupe -d <dir> [--exclude NAME ...]
        reference-parity duplicate-file finder: scan, two-phase dedupe,
        timestamped results JSON + console summary.

    python -m dedupe_rust_ray er --input <parquet> --out <dir>
        [--checkpoint-dir D] [--resume] [--batch-size N]
        flagship entity resolution over an interleaved documents table;
        writes out/clusters/ parquet parts + run_manifest.json, resumable
        via per-stage checkpoints.

Owns its Ray session (guarded init) — the driver contract in
``__ray_entry__.py`` never goes through here.
"""

from __future__ import annotations

import argparse
import json
import sys


_OWNS_RAY = False


def _ensure_ray() -> None:
    global _OWNS_RAY
    import ray

    if not ray.is_initialized():
        # inside `ray job submit` the runtime sets RAY_ADDRESS to the
        # cluster; standalone (and in this sandbox) it resolves to "local"
        import os

        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
        _OWNS_RAY = True
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _cmd_filededupe(args: argparse.Namespace) -> int:
    from .pipelines.filededupe import file_dedupe_results

    _ensure_ray()
    results = file_dedupe_results(
        args.directory, exclude=tuple(args.exclude), out_dir=args.out_dir
    )
    summary = results["summary"] if "summary" in results else results
    print(json.dumps(summary, indent=2, default=str))
    return 0


def _cmd_probe(args: argparse.Namespace) -> int:
    from .stages.dims import probe_dims, sniff_format

    with open(args.file, "rb") as f:
        data = f.read()
    fmt = sniff_format(data)
    dims = probe_dims(fmt, data) if fmt else None
    print(
        json.dumps(
            {
                "file": args.file,
                "format": fmt,
                "width": dims[0] if dims else None,
                "height": dims[1] if dims else None,
                "bytes": len(data),
            }
        )
    )
    return 0 if dims else 1


def _cmd_er(args: argparse.Namespace) -> int:
    import ray.data

    from .config import ERConfig
    from .pipelines.er import run_er_job

    _ensure_ray()
    cfg = ERConfig(
        batch_size=args.batch_size,
        checkpoint_dir=args.checkpoint_dir,
        resume=args.resume,
    )
    docs = ray.data.read_parquet(args.input)
    manifest = run_er_job(docs, cfg, args.out)
    print(json.dumps(manifest, indent=2))
    return 0


def _cmd_curate(args: argparse.Namespace) -> int:
    from .pipelines.curation import curate_corpus

    _ensure_ray()
    summary = curate_corpus(
        args.sf_dir,
        args.out,
        min_quality=args.min_quality,
        resume=args.resume,
    )
    print(json.dumps(summary, indent=2))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="dedupe_rust_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    fd = sub.add_parser("filededupe", help="reference-parity duplicate-file finder")
    fd.add_argument("-d", "--directory", required=True)
    fd.add_argument(
        "-b", "--batch_size", type=int, default=100,
        help="accepted for reference CLI parity (the reference parses but "
        "never uses it, src/main.rs:67-69; Ray sizes batches itself)",
    )
    fd.add_argument("--exclude", action="append", default=[])
    fd.add_argument("--out-dir", default=".")
    fd.set_defaults(fn=_cmd_filededupe)

    probe = sub.add_parser(
        "probe",
        help="diagnostic header probe for one media file (the reference's "
        "standalone HEIC test binaries, test_heic_support.rs:7-44, "
        "generalized to every supported format; no Ray session needed)",
    )
    probe.add_argument("file")
    probe.set_defaults(fn=_cmd_probe)

    er = sub.add_parser("er", help="entity resolution over interleaved documents")
    er.add_argument("--input", required=True, help="parquet file/dir of documents")
    er.add_argument("--out", required=True, help="output directory")
    er.add_argument("--checkpoint-dir", default=None)
    er.add_argument("--resume", action="store_true")
    er.add_argument("--batch-size", type=int, default=1024)
    er.set_defaults(fn=_cmd_er)

    cu = sub.add_parser(
        "curate",
        help="resumable corpus curation: quality gate + exact dedup + "
        "split assignment -> split-partitioned parquet with lineage "
        "manifests",
    )
    cu.add_argument("--sf-dir", required=True, help="directory with documents.parquet")
    cu.add_argument("--out", required=True, help="output/checkpoint directory")
    cu.add_argument("--min-quality", type=float, default=0.5)
    cu.add_argument("--resume", action="store_true")
    cu.set_defaults(fn=_cmd_curate)

    args = p.parse_args(argv)
    code = args.fn(args)
    import ray

    # only shut down a session this CLI started — never an external one
    # (e.g. the pytest session fixture calling main() in-process)
    if _OWNS_RAY and ray.is_initialized():
        ray.shutdown()
    return code


if __name__ == "__main__":
    sys.exit(main())
