#!/usr/bin/env python
"""Alias/rollover ops CLI (spark-submit-able): named pointers over
index roots through operators/aliases.py's atomic versioned registry.

    python jobs/alias.py --catalog /cat create docs --roots g0,g1
    python jobs/alias.py --catalog /cat list
    python jobs/alias.py --catalog /cat update docs --add g2 --remove g0
    python jobs/alias.py --catalog /cat resolve docs
    python jobs/alias.py --catalog /cat rollover docs --new-root g3 \
        --max-docs 50000000
    python jobs/alias.py --catalog /cat delete docs
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True,
                    help="catalog root holding the alias registry")
    ap.add_argument("--cores", type=int, default=None)
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create")
    c.add_argument("name")
    c.add_argument("--roots", required=True, help="comma-separated")
    c.add_argument("--write", default=None)

    sub.add_parser("list")

    u = sub.add_parser("update")
    u.add_argument("name")
    u.add_argument("--add", default="")
    u.add_argument("--remove", default="")
    u.add_argument("--write", default=None)

    r = sub.add_parser("resolve")
    r.add_argument("name")

    d = sub.add_parser("delete")
    d.add_argument("name")

    ro = sub.add_parser("rollover")
    ro.add_argument("name")
    ro.add_argument("--new-root", required=True)
    ro.add_argument("--max-docs", type=int, default=None)
    ro.add_argument("--max-segments", type=int, default=None)
    ro.add_argument("--force", action="store_true")

    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from data_text_search_spark.operators.aliases import AliasCatalog

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        from data_text_search_spark.session import get_spark
        spark = get_spark(app_name=f"alias_{args.cmd}", cores=args.cores)

    cat = AliasCatalog(spark, args.catalog)
    if args.cmd == "create":
        cat.create(args.name, args.roots.split(","), write=args.write)
        out = {"created": args.name, "indexes": cat.resolve(args.name)}
    elif args.cmd == "list":
        out = cat.list_aliases()
    elif args.cmd == "update":
        cat.update(args.name,
                   add=[x for x in args.add.split(",") if x],
                   remove=[x for x in args.remove.split(",") if x],
                   write=args.write)
        out = {"updated": args.name, "indexes": cat.resolve(args.name),
               "write": cat.write_index(args.name)}
    elif args.cmd == "resolve":
        out = {"indexes": cat.resolve(args.name),
               "write": cat.write_index(args.name)}
    elif args.cmd == "delete":
        cat.delete(args.name)
        out = {"deleted": args.name}
    else:
        rolled = cat.rollover(args.name, args.new_root,
                              max_docs=args.max_docs,
                              max_segments=args.max_segments,
                              force=args.force)
        out = {"rolled": rolled, "indexes": cat.resolve(args.name),
               "write": cat.write_index(args.name)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
