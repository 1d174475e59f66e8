#!/usr/bin/env python
"""spark-submit entrypoint for the KG-construction pipeline.

Cluster deployment (the north-rule shape):

    zip -r kargo_spark.zip kargo_spark
    spark-submit --py-files kargo_spark.zip job.py \
        --input  <parquet/iceberg path of (repo,path,commit,lang,content)> \
        --workdir <checkpoint root> --ranker tfidf --n-terms 15

Local smoke (synthesizes input):

    python job.py --synth 1000 --workdir /tmp/kargo_job
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="input table path (parquet dir)")
    ap.add_argument("--synth", type=int, default=0, help="synthesize N input rows instead")
    ap.add_argument("--workdir", required=True, help="checkpoint root")
    ap.add_argument("--ranker", default="tfidf",
                    choices=["tfidf", "kpminer", "yake", "singlerank", "positionrank"])
    ap.add_argument("--n-terms", type=int, default=15)
    ap.add_argument("--cluster-relations", action="store_true")
    # default None lets run_pipeline auto-switch exact->scalable by input
    # size; the flag forces the scalable path
    ap.add_argument("--scalable-clustering", action="store_true", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--use-snapshots", action="store_true",
                    help="stage checkpoints as Iceberg-lite snapshot tables")
    ap.add_argument("--graph-root", help="materialize node/edge graph tables here")
    ap.add_argument("--graph-prefix",
                    help="publish the bucketed graph substrate (triples/nodes/"
                         "edges/hop tables) under this catalog prefix; later "
                         "ingests fold in via pipeline.ingest_increment")
    args = ap.parse_args()

    from kargo_spark.pipeline import run_pipeline
    from kargo_spark.session import get_spark

    spark = get_spark(app_name="kargo_job")
    if args.synth:
        from kargo_spark.synth import synth_documents

        docs = synth_documents(spark, n_rows=args.synth)
    elif args.input:
        docs = spark.read.parquet(args.input)
    else:
        raise SystemExit("one of --input/--synth is required")

    out = run_pipeline(
        spark, docs, args.workdir,
        ranker=args.ranker, n_terms=args.n_terms,
        cluster_relations=args.cluster_relations,
        scalable_clustering=args.scalable_clustering,
        resume=not args.no_resume,
        use_snapshots=args.use_snapshots,
        graph_prefix=args.graph_prefix,
    )
    metrics = [r.asDict() for r in out["metrics"].collect()]
    result = {"stages": metrics, "triples": out["triples"].count()}
    if args.graph_root:
        from kargo_spark.iceberg_lite import write_graph_tables

        result["graph_snapshots"] = write_graph_tables(
            spark, out["triples"], args.graph_root
        )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
