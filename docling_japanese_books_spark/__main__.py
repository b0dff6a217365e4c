"""CLI parity with the reference's entry points (ref cli.py:136-157 process,
query.py:11-34 search, cli.py:374-444 evaluate) — argparse, stdlib-only.

    python -m docling_japanese_books_spark process <pages.parquet> -o out/
    python -m docling_japanese_books_spark search "query text" -i out/data
    python -m docling_japanese_books_spark evaluate --sf-dir /root/testdata/sf0.01
    python -m docling_japanese_books_spark stats <directory>

Each command is a thin shell over the library; all heavy lifting stays in
DataFrame plans. The reference's broken `search` import (SURVEY §2.11) has
no analog here — every command is wired and tested.
"""

from __future__ import annotations

import argparse
import sys


def cmd_process(args) -> int:
    from .pipeline.driver import run_extraction_pipeline
    from .session import get_spark

    spark = get_spark("cli-process")
    pages = spark.read.parquet(args.input)
    if args.dry_run:
        n = pages.count()
        print(f"dry run: {n} pages would be processed into {args.buckets} buckets")
        for r in pages.select("url").limit(10).collect():  # ref cli.py:103-106
            print("  ", r.url)
        return 0
    result = run_extraction_pipeline(
        spark,
        pages,
        args.output,
        run_id=args.run_id,
        source=args.input,
        n_buckets=args.buckets,
        wave_size=args.wave_size,
    )
    print(
        f"processed buckets={len(result.buckets_processed)} "
        f"skipped={len(result.buckets_skipped)} rows_out={result.rows_out}"
    )
    return 0


def cmd_search(args) -> int:
    from pyspark.sql import functions as F

    from .functions.text import preview
    from .operators.embedding import embed_udf
    from .operators.similarity import topk_bruteforce
    from .session import get_spark

    spark = get_spark("cli-search")
    corpus = spark.read.parquet(args.index)
    if args.document:  # F2 document filter (ref vector_db.py:358-360)
        corpus = corpus.filter(F.col("url") == args.document)
    corpus = corpus.withColumn("embedding", embed_udf()(F.col("text"))).withColumn(
        "vec_id", F.xxhash64("url")
    )
    queries = spark.createDataFrame([(0, args.query)], "query_id long, qtext string")
    queries = queries.select(
        "query_id", embed_udf()(F.col("qtext")).alias("embedding")
    )
    hits = topk_bruteforce(queries, corpus, k=args.limit).join(
        corpus.select("vec_id", "url", "text"), "vec_id"
    )
    for r in hits.orderBy("rank").select(
        "rank", "score", "url", preview(F.col("text")).alias("preview")
    ).collect():
        print(f"{r.rank}. [{r.score:.4f}] {r.url}\n   {r.preview}")
    return 0


def cmd_evaluate(args) -> int:
    from .queries import REGISTRY
    from .session import get_spark

    spark = get_spark("cli-evaluate")
    df = REGISTRY["evaluation_study"].fn(spark, args.sf_dir)
    rows = df.collect()
    cols = df.columns
    print(" | ".join(cols))
    for r in rows:
        print(" | ".join(str(r[c]) for c in cols))
    return 0


def cmd_curate(args) -> int:
    from .pipeline.curate import curate_corpus
    from .session import get_spark

    spark = get_spark("cli-curate")
    extracted = spark.read.parquet(args.input)
    split_csv = lambda s: tuple(x for x in s.split(",") if x)  # noqa: E731
    curated, report = curate_corpus(
        extracted,
        min_quality=args.min_quality,
        near_dup_threshold=args.near_dup,
        url_blocked_domains=split_csv(args.url_block_domains),
        url_blocked_subwords=split_csv(args.url_block_subwords),
        dsir_target=(
            spark.read.parquet(args.dsir_target) if args.dsir_target else None
        ),
        dsir_keep=args.dsir_keep,
        gopher=args.gopher,
        gopher_repetition=args.gopher_repetition,
        c4=args.c4,
        model_quality_min=args.model_quality,
        substring_min_len=args.substring_min_len,
        semantic_tau=args.semantic_tau,
    )
    curated.write.mode("overwrite").parquet(args.output)
    line = (
        f"in={report.rows_in} quality_pass={report.rows_quality_pass} "
        f"exact_dedup={report.rows_after_exact_dedup} "
        f"near_dedup={report.rows_after_near_dedup}"
    )
    if report.rows_url_pass is not None:
        line += f" url_pass={report.rows_url_pass}"
    if report.rows_c4_pass is not None:
        line += f" c4_pass={report.rows_c4_pass}"
    if report.rows_gopher_pass is not None:
        line += f" gopher_pass={report.rows_gopher_pass}"
    if report.rows_model_quality_pass is not None:
        line += f" model_pass={report.rows_model_quality_pass}"
    if report.rows_after_semantic_dedup is not None:
        line += f" semantic_dedup={report.rows_after_semantic_dedup}"
    if report.rows_after_substring_cut is not None:
        line += (
            f" substring_cut={report.rows_after_substring_cut}"
            f" chars_removed={report.substring_chars_removed}"
            f" substring_path={report.substring_path}"
        )
    if report.rows_after_dsir is not None:
        line += f" dsir_kept={report.rows_after_dsir}"
    print(line)
    return 0


def cmd_chunk(args) -> int:
    """C7 end-to-end: pick the model's preferred chunking strategy (with
    fallback walk), chunk, write parquet tagged with chunking_method."""
    from pyspark.sql import functions as F

    from .operators.strategy import chunk_with_strategy
    from .session import get_spark

    spark = get_spark("cli-chunk")
    docs = spark.read.parquet(args.input)
    id_col = "doc_id" if "doc_id" in docs.columns else "url"
    docs = docs.select(F.col(id_col).alias("doc_id"), "text")
    chunks, strategy = chunk_with_strategy(
        docs, args.model, max_chunk_length=args.max_chunk_length
    )
    chunks.write.mode("overwrite").parquet(args.output)
    n = spark.read.parquet(args.output).count()
    print(f"strategy={strategy} chunks={n} -> {args.output}")
    return 0


def cmd_stats(args) -> int:
    from .sources.files import discover_files, extension_histogram
    from .session import get_spark

    spark = get_spark("cli-stats")
    files = discover_files(spark, args.directory)
    for r in extension_histogram(files).orderBy("ext").collect():  # ref cli.py:84-92
        print(f"{r.ext}: {r.n}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="docling_japanese_books_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("process", help="extract main content, resumable")
    pr.add_argument("input")
    pr.add_argument("-o", "--output", required=True)
    pr.add_argument("--run-id", default="cli")
    pr.add_argument("--buckets", type=int, default=32)
    pr.add_argument("--wave-size", type=int, default=8)
    pr.add_argument("--dry-run", action="store_true")
    pr.set_defaults(fn=cmd_process)

    se = sub.add_parser("search", help="top-k similarity search")
    se.add_argument("query")
    se.add_argument("-i", "--index", required=True, help="extracted data path")
    se.add_argument("-l", "--limit", type=int, default=5)
    se.add_argument("-d", "--document", default=None, help="filter to one url")
    se.set_defaults(fn=cmd_search)

    ev = sub.add_parser("evaluate", help="chunking-strategy comparison study")
    ev.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ev.set_defaults(fn=cmd_evaluate)

    cu = sub.add_parser("curate", help="normalize + quality gate + dedup")
    cu.add_argument("input", help="extracted data path (url, text, ...)")
    cu.add_argument("-o", "--output", required=True)
    cu.add_argument("--min-quality", type=float, default=0.3)
    cu.add_argument("--near-dup", type=float, default=0.85)
    cu.add_argument(
        "--url-block-domains", default="",
        help="comma-separated blocked domains (matched by host AND eTLD+1)",
    )
    cu.add_argument(
        "--url-block-subwords", default="",
        help="comma-separated substrings that block a URL outright",
    )
    cu.add_argument(
        "--dsir-target", default=None,
        help="parquet path of a target corpus (url, text) — enables the "
             "final DSIR selection stage toward its distribution",
    )
    cu.add_argument(
        "--dsir-keep", type=int, default=None,
        help="how many survivors DSIR keeps (required with --dsir-target)",
    )
    cu.add_argument(
        "--gopher", action="store_true",
        help="also require every Gopher heuristic rule to pass",
    )
    cu.add_argument(
        "--gopher-repetition", action="store_true",
        help="also require the Gopher repetition battery to pass",
    )
    cu.add_argument(
        "--c4", action="store_true",
        help="apply the C4 line/page cleaning recipe before scoring",
    )
    cu.add_argument(
        "--model-quality", type=float, default=None,
        help="enable the learned quality gate at this threshold",
    )
    cu.add_argument(
        "--substring-min-len", type=int, default=None,
        help="enable the ExactSubstr cut at this window length",
    )
    cu.add_argument(
        "--semantic-tau", type=float, default=None,
        help="enable SemDeDup semantic dedup at this cosine threshold",
    )
    cu.set_defaults(fn=cmd_curate)

    ch = sub.add_parser("chunk", help="chunk with a model's preferred strategy")
    ch.add_argument("input", help="documents parquet (doc_id/url, text)")
    ch.add_argument("-o", "--output", required=True)
    ch.add_argument("-m", "--model", default="BAAI/bge-m3")
    ch.add_argument("--max-chunk-length", type=int, default=500)
    ch.set_defaults(fn=cmd_chunk)

    st = sub.add_parser("stats", help="file-type histogram of a directory")
    st.add_argument("directory")
    st.set_defaults(fn=cmd_stats)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
