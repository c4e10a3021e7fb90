"""CLI entry point: ``python -m etl_template_spark <cmd>``.

The switching-user affordance: every registered query is runnable from
the shell against any fixture directory, without writing a line of
PySpark — the operational equivalent of the reference's ``go run``
entry (etl.go:146-159), generalized from one hard-wired pipeline to the
full query inventory.

    python -m etl_template_spark list [--tag TAG]
    python -m etl_template_spark run q_agg_group [--sf-dir DIR]
        [--show N] [--out ROOT]      # --out commits a versioned dataset
    python -m etl_template_spark oracle q_agg_group   # print DuckDB SQL
    python -m etl_template_spark example etl_template [data_root]

Installed wheels expose the same CLI as the ``etl-template-spark``
console script (pyproject ``[project.scripts]``).

``run`` executes the query's full plan; with ``--out`` the result
commits through the atomic versioned sink (the same write path every
pipeline step uses), otherwise the first ``--show`` rows print.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="python -m etl_template_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("--tag", help="filter by tag (e.g. llm, dedup, topk)")

    p_run = sub.add_parser("run", help="run a registered query")
    p_run.add_argument("name")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--show", type=int, default=20,
                       help="rows to print (ignored with --out)")
    p_run.add_argument("--out", help="commit the result as a versioned "
                                     "dataset under this root instead of printing")

    p_orc = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    p_orc.add_argument("name")

    from .examples import EXAMPLE_NAMES

    p_ex = sub.add_parser(
        "example",
        help="run a worked example pipeline (etl_template_spark.examples)",
    )
    p_ex.add_argument("name", choices=list(EXAMPLE_NAMES))
    p_ex.add_argument(
        "args",
        nargs="*",
        help="positional args, same as the example module's script usage",
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.cmd == "example":
        import importlib
        import tempfile

        a = args.args
        # import the NAMED module, never a bare-else fallback (r10
        # review): a new EXAMPLE_NAMES entry used to be accepted by
        # argparse and then silently routed to quality_gate — the wrong
        # pipeline committing datasets under the caller's --out root
        mod = importlib.import_module(f".examples.{args.name}", __package__)
        if args.name in ("etl_template", "streaming_ingest"):
            # signature: run(data_root)
            prefix = (
                "etl_example_" if args.name == "etl_template" else "ingest_example_"
            )
            mod.run(a[0] if a else tempfile.mkdtemp(prefix=prefix))
        else:
            # signature: run(data_root=None, sf_dir=SF_DIR); CLI order
            # is [sf_dir] [data_root] (matching each module's __main__)
            mod.run(
                a[1] if len(a) > 1 else None,
                a[0] if a else mod.SF_DIR,
            )
        return 0

    from .queries import REGISTRY

    if args.cmd == "list":
        for name, q in REGISTRY.items():
            if args.tag and args.tag not in q.tags:
                continue
            check = "sql-oracle" if q.oracle else "rows-only"
            print(f"{name}\t{check}\t{','.join(q.tags)}")
        return 0

    if args.cmd == "oracle":
        q = REGISTRY.get(args.name)
        if q is None:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        if q.oracle is None:
            print(f"{args.name} has no SQL oracle", file=sys.stderr)
            return 1
        print(q.oracle.strip())
        return 0

    from .session import get_spark

    if args.cmd == "run":
        q = REGISTRY.get(args.name)
        if q is None:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        spark = get_spark(app_name=f"cli-{args.name}")
        t0 = time.perf_counter()
        df = q.build(spark, args.sf_dir)
        if args.out:
            from .io import write_versioned

            version, path = write_versioned(df, args.out, args.name)
            elapsed = time.perf_counter() - t0
            print(json.dumps({
                "query": args.name, "version": version, "path": path,
                "sec": round(elapsed, 3),
            }))
        else:
            df.show(args.show, truncate=False)
            print(json.dumps({
                "query": args.name,
                "sec": round(time.perf_counter() - t0, 3),
            }))
        return 0

    return 0


if __name__ == "__main__":
    sys.exit(main())
