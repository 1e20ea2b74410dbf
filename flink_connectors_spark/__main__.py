"""CLI: explore and run the engine's registered queries.

  python -m flink_connectors_spark list [--tag TAG]
  python -m flink_connectors_spark run NAME [--sf-dir DIR] [--show N]
  python -m flink_connectors_spark explain NAME [--sf-dir DIR]
  python -m flink_connectors_spark oracle NAME
  python -m flink_connectors_spark verify NAME [--sf-dir DIR]

`verify` runs the Spark plan AND its DuckDB oracle side by side and
diffs the results — the same check the external driver performs.
"""

from __future__ import annotations

import argparse
import os
import sys


def _specs():
    from .registry import all_specs

    return all_specs()


def _session():
    from .session import build_session

    spark = build_session(app_name="fcs-cli")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_list(args) -> int:
    specs = _specs()
    for name, spec in sorted(specs.items()):
        if args.tag and args.tag not in spec.tags:
            continue
        oracle = "oracle" if spec.oracle else "rows-only"
        tags = ",".join(spec.tags)
        print(f"{name:40s} [{oracle}] {tags}")
    return 0


def cmd_run(args) -> int:
    spec = _specs()[args.name]
    df = spec.fn(_session(), args.sf_dir)
    df.show(args.show, truncate=False)
    return 0


def cmd_explain(args) -> int:
    spec = _specs()[args.name]
    _specs()[args.name].fn(_session(), args.sf_dir).explain("formatted")
    print(f"\n-- {args.name}: {spec.doc.strip().splitlines()[0] if spec.doc else ''}")
    return 0


def cmd_oracle(args) -> int:
    spec = _specs()[args.name]
    if spec.oracle is None:
        print(f"{args.name} has no SQL oracle (rows-only check)")
        return 1
    print(spec.oracle.strip())
    return 0


def cmd_verify(args) -> int:
    import duckdb

    from . import TABLES

    spec = _specs()[args.name]
    spark = _session()
    s = sorted(
        map(tuple, spec.fn(spark, args.sf_dir).collect()), key=str
    )
    if spec.oracle is None:
        print(f"{args.name}: rows-only — {len(s)} rows")
        return 0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(args.sf_dir, t)}.parquet'"
        )
    d = sorted(con.execute(spec.oracle).fetchall(), key=str)
    ok = s == d
    print(f"{args.name}: spark={len(s)} rows, duckdb={len(d)} rows, "
          f"{'MATCH' if ok else 'MISMATCH'}")
    if not ok:
        for a, b in zip(s, d):
            if a != b:
                print(f"  first diff:\n    spark : {a}\n    duckdb: {b}")
                break
        return 1
    return 0


def cmd_verify_all(args) -> int:
    """Full-surface sweep: every registered query vs its DuckDB
    oracle in ONE session (bench-style state release between
    queries). The fixture-masked oracle-divergence class — discrete
    order statistics whose ranks differ by corpus size — only shows
    up when the same contract runs at MULTIPLE scale factors, so the
    round-close hygiene is one sweep per sf dir:

        python -m flink_connectors_spark verify-all --sf-dir /root/testdata/sf0.1
    """
    import duckdb

    from . import TABLES

    specs = _specs()
    names = (
        [n.strip() for n in args.names.split(",") if n.strip()]
        if args.names
        else sorted(specs)
    )
    spark = _session()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(args.sf_dir, t)}.parquet'"
        )
    failed: list[str] = []
    for name in names:
        spec = specs[name]
        try:
            s = sorted(
                map(tuple, spec.fn(spark, args.sf_dir).collect()), key=str
            )
            if spec.oracle is None:
                print(f"{name}: rows-only — {len(s)} rows")
                continue
            d = sorted(con.execute(spec.oracle).fetchall(), key=str)
            ok = s == d
        except Exception as e:  # a hard error is a failure, not a crash
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failed.append(name)
            ok = None
        finally:
            # release what the plan pinned (same lifecycle as bench.py)
            spark.catalog.clearCache()
            for jrdd in list(
                spark.sparkContext._jsc.getPersistentRDDs().values()
            ):
                try:
                    jrdd.unpersist()
                except Exception:
                    pass
        if ok is None:
            if args.stop_on_fail:
                break
            continue
        print(
            f"{name}: spark={len(s)} duckdb={len(d)} "
            f"{'MATCH' if ok else 'MISMATCH'}"
        )
        if not ok:
            failed.append(name)
            if args.stop_on_fail:
                break
    print(
        f"\n{len(names) - len(failed)}/{len(names)} matched"
        + (f"; FAILED: {', '.join(failed)}" if failed else "")
    )
    return 1 if failed else 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="flink_connectors_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    default_sf = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )

    sp = sub.add_parser("list", help="list registered queries")
    sp.add_argument("--tag", default=None)
    sp.set_defaults(fn=cmd_list)

    for name, fn in (
        ("run", cmd_run),
        ("explain", cmd_explain),
        ("verify", cmd_verify),
    ):
        sp = sub.add_parser(name)
        sp.add_argument("name")
        sp.add_argument("--sf-dir", default=default_sf)
        if name == "run":
            sp.add_argument("--show", type=int, default=20)
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    sp.add_argument("name")
    sp.set_defaults(fn=cmd_oracle)

    sp = sub.add_parser(
        "verify-all",
        help="run every query vs its oracle (one session, state "
        "released per query); exit 1 on any mismatch",
    )
    sp.add_argument("--sf-dir", default=default_sf)
    sp.add_argument("--names", default=None, help="comma-separated subset")
    sp.add_argument("--stop-on-fail", action="store_true")
    sp.set_defaults(fn=cmd_verify_all)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
