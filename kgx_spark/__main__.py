"""CLI mirroring the reference's `kgx` entry points (kgx/cli/__init__.py):

    python -m kgx_spark transform --input-format tsv -i graph_dir \
        --output-format jsonl -o out/graph
    python -m kgx_spark merge --config merge.yaml
    python -m kgx_spark graph-summary --input-format tsv -i graph_dir -o stats.yaml
    python -m kgx_spark validate --input-format jsonl -i graph_dir
"""

from __future__ import annotations

import argparse
import json
import sys

from kgx_spark.session import get_spark


def _io_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("-i", "--input", required=True)
    p.add_argument("--input-format", required=True)
    p.add_argument("--node-filters", default=None, help="JSON dict, e.g. '{\"category\": [\"biolink:Gene\"]}'")
    p.add_argument("--edge-filters", default=None)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kgx_spark")
    ap.add_argument("--master", default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transform", help="kgx transform (kgx/cli/__init__.py:734)")
    _io_args(t)
    t.add_argument("-o", "--output", required=True)
    t.add_argument("--output-format", required=True)
    t.add_argument("--operations", default=None, help="JSON list of {name, args}")

    m = sub.add_parser("merge", help="kgx merge (kgx/cli/__init__.py:833)")
    m.add_argument("--config", required=True, help="YAML: {sources: {..}, destination: {..}}")

    g = sub.add_parser("graph-summary", help="kgx graph-summary (cli_utils.py:68-164)")
    _io_args(g)
    g.add_argument("-o", "--output", default=None)
    g.add_argument(
        "--report-type", default="kgx-map",
        choices=["kgx-map", "meta-knowledge-graph"],
        help="summary report type (cli_utils.py:21 summary_report_types)",
    )

    v = sub.add_parser("validate", help="kgx validate (cli_utils.py:167-229)")
    _io_args(v)

    args = ap.parse_args(argv)
    spark = get_spark("kgx_spark_cli", master=args.master)

    def input_args():
        d = {"filename": args.input, "format": args.input_format}
        if args.node_filters:
            d["node_filters"] = {k: set(v) if isinstance(v, list) else v
                                 for k, v in json.loads(args.node_filters).items()}
        if args.edge_filters:
            d["edge_filters"] = {k: set(v) if isinstance(v, list) else v
                                 for k, v in json.loads(args.edge_filters).items()}
        return d

    if args.cmd == "transform":
        from kgx_spark.transform import transform

        ops = json.loads(args.operations) if args.operations else None
        nodes, edges = transform(
            spark, input_args(),
            {"filename": args.output, "format": args.output_format}, ops,
        )
        print(json.dumps({"nodes": nodes.count() if nodes is not None else 0,
                          "edges": edges.count() if edges is not None else 0}))
    elif args.cmd == "merge":
        import yaml

        from kgx_spark.transform import merge

        with open(args.config) as fh:
            cfg = yaml.safe_load(fh)
        sources = [
            {"filename": s["input"]["filename"], "format": s["input"]["format"]}
            for s in cfg["configuration"]["sources"].values()
        ] if "configuration" in cfg else [
            {"filename": s["input"]["filename"], "format": s["input"]["format"]}
            for s in cfg["sources"].values()
        ]
        dest = list(cfg.get("destination", cfg.get("destinations", {})).values())[0]
        nodes, edges = merge(spark, sources, {"filename": dest["filename"], "format": dest["format"]})
        print(json.dumps({"nodes": nodes.count(), "edges": edges.count()}))
    elif args.cmd == "graph-summary":
        from kgx_spark.transform import read_source

        nodes, edges = read_source(spark, input_args())
        if args.report_type == "meta-knowledge-graph":
            from kgx_spark.operators.meta_kg import meta_knowledge_graph

            stats = meta_knowledge_graph(nodes, edges)
        else:
            from kgx_spark.operators.summary import summarize_graph

            stats = summarize_graph(nodes, edges)
        out = json.dumps(stats, indent=2, default=str)
        if args.output:
            with open(args.output, "w") as fh:
                fh.write(out)
        else:
            print(out)
    elif args.cmd == "validate":
        from kgx_spark.operators.validator import (
            error_report,
            validate_edge_records,
            validate_node_records,
        )
        from kgx_spark.transform import read_source

        nodes, edges = read_source(spark, input_args())
        errs = validate_node_records(nodes).unionByName(validate_edge_records(edges))
        rows = error_report(errs).collect()
        for r in rows:
            print(f"[{r['level']}] {r['error_type']}: {r['message']} ({r['count']} entities)")
        return 1 if any(r["level"] == "ERROR" for r in rows) else 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
