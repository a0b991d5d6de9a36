"""spark-submit entry point for training-corpus preparation.

The LLM-data-pipeline counterpart of rollup_job.py: runs the composite
corpus-prep pipeline (quality gate -> language gate -> exact dedup ->
minhash near-dup with cluster-canonical keep) over a document table
and writes the cleaned corpus plus a per-stage retention report.

Runs with materialize=True staging: every stage spills to parquet once
under <output>/_staging, so the report costs one count per staged
table instead of O(stages) full pipeline re-runs, and the clean-corpus
write reuses the final staged table.

Usage:
    python jobs/corpus_job.py --input /data/documents.parquet \
        --output /data/clean_corpus --languages en --max-df 1000
    # report lands at <output>/_report (stage, docs_kept) and prints

    # subset of stages / different columns:
    ... --stages exact,neardup --id-col id --text-col body
"""

from __future__ import annotations

import argparse
import pathlib
import shutil
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet/table")
    ap.add_argument("--output", required=True, help="clean corpus output dir")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--stages", default="quality,language,exact,neardup")
    ap.add_argument("--languages", default=None,
                    help="comma list, e.g. en,de (omit = keep all)")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--max-df", type=int, default=1000,
                    help="hot-shingle cap for near-dup (0 = uncapped)")
    ap.add_argument("--minhash-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args(argv)

    from mimir_spark import dedup
    from mimir_spark.pipeline import CorpusConfig, prepare_corpus
    from mimir_spark.session import get_spark
    from mimir_spark.sources.tables import read_table

    spark = get_spark("corpus-job", cpus=args.cpus)
    docs = read_table(spark, args.input)
    cfg = CorpusConfig(
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        min_quality=args.min_quality,
        languages=tuple(args.languages.split(",")) if args.languages else None,
        minhash_tau_bands=args.bands,
        minhash_hashes=args.minhash_hashes,
        shingle_n=args.shingle_n,
        max_df=args.max_df or None,
        stages=tuple(args.stages.split(",")),
    )
    out = pathlib.Path(args.output)
    staging = out.parent / (out.name + "_staging")
    clean, report = prepare_corpus(docs, cfg, id_col=args.id_col,
                                   text_col=args.text_col,
                                   materialize=True,
                                   scratch_dir=str(staging))
    clean.write.mode("overwrite").parquet(str(out))
    report.write.mode("overwrite").parquet(str(out / "_report"))
    for r in spark.read.parquet(str(out / "_report")) \
            .orderBy("docs_kept", ascending=False).collect():
        print(f"{r['stage']:>10}: {r['docs_kept']} docs")
    n = spark.read.parquet(str(out)).count()
    print(f"clean corpus: {n} docs -> {out}")
    shutil.rmtree(staging, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
