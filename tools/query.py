"""CLI query runner — the thin operational surface a user of the
reference's gRPC API would script against.

Examples:
  python tools/query.py search --root /data --name memories \
      --users 0 1 --vector 1,0,0,0 --k 5
  python tools/query.py term-search --root /data --name memories \
      --users 0 --filter '{"contains": {"path": "title", "value": "running"}}' --limit 10
  python tools/query.py stats --root /data --name memories
  python tools/query.py optimize --root /data --name memories
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="muopdb-spark-query")
    ap.add_argument("command", choices=["search", "term-search", "stats", "optimize", "flush"])
    ap.add_argument("--root", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--users", type=int, nargs="*", default=None)
    ap.add_argument("--vector", help="comma-separated floats")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--filter", dest="filter_json", help="DocumentFilter JSON tree")
    ap.add_argument("--limit", type=int, default=10)
    args = ap.parse_args(argv)

    from muopdb_spark.catalog import Collection
    from muopdb_spark.session import get_spark

    spark = get_spark("muopdb-query")
    spark.sparkContext.setLogLevel("ERROR")
    col = Collection.open(spark, args.root, args.name)

    if args.command == "search":
        if not args.vector:
            ap.error("search requires --vector")
        qv = [float(x) for x in args.vector.split(",")]
        rows = col.search(args.users, qv, args.k).collect()
        print(json.dumps({"hits": [
            {"doc_id": r["doc_id"], "score": r["score"]} for r in rows
        ]}))
    elif args.command == "term-search":
        if not args.filter_json:
            ap.error("term-search requires --filter")
        rows = col.term_search(args.users, json.loads(args.filter_json), args.limit).collect()
        print(json.dumps({"doc_ids": [r["doc_id"] for r in rows]}))
    elif args.command == "stats":
        print(json.dumps({"toc": col.toc(), "segments": col.stats()}))
    elif args.command == "optimize":
        print(json.dumps(col.auto_optimize()))
    elif args.command == "flush":
        print(json.dumps({"flushed_segment": col.flush()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
