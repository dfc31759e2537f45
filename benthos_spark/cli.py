"""Engine CLI: run / lint / blobl / echo / test.

Reference: the benthos binary's subcommands (lib/service/run.go:158-316;
`benthos lint` lib/service/lint.go; `benthos blobl` lib/service/blobl/;
`benthos test` lib/service/test/).

    python -m benthos_spark run -c config.yaml
    python -m benthos_spark lint -c config.yaml
    python -m benthos_spark blobl 'root.x = this.a + 1'   # stdin JSON lines
    python -m benthos_spark test tests.yaml
"""

from __future__ import annotations

import argparse
import json
import sys


def _cmd_run(args) -> int:
    from benthos_spark.session import get_spark
    from benthos_spark.stream import run_stream
    spark = get_spark("benthos-spark-run")
    out = run_stream(spark, args.config)
    if args.show:
        out.show(args.show, truncate=False)
    return 0


def _cmd_lint(args) -> int:
    """Build the plan without executing — config errors + Bloblang
    parse/compile errors surface here, like the reference's startup
    lint (run.go:194-200)."""
    from benthos_spark.session import get_spark
    from benthos_spark.stream import ConfigError, build_stream
    spark = get_spark("benthos-spark-lint")
    try:
        df = build_stream(spark, args.config)
    except (ConfigError, ValueError) as e:
        print(f"lint: {e}", file=sys.stderr)
        return 1
    if args.explain:
        df.explain("formatted")
    print("config OK")
    return 0


def _cmd_blobl(args) -> int:
    """REPL over stdin: each line is a JSON object document; the mapping
    output prints as JSON (lib/service/blobl/ semantics on a columnar
    engine: the line becomes a one-row DataFrame)."""
    from pyspark.sql import functions as F

    from benthos_spark.bloblang import map_text
    from benthos_spark.session import get_spark
    spark = get_spark("benthos-spark-blobl")
    mapping = args.mapping
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            doc = json.loads(line)
            from benthos_spark.operators.literals import dict_literal_frame
            df = (dict_literal_frame(spark, doc)
                  if isinstance(doc, dict) else None)
            if df is None:  # nested/None values → inference path
                df = spark.createDataFrame([doc])
            out = map_text(df, mapping)
            row = out.collect()[0]
            print(json.dumps(row.asDict(recursive=True), sort_keys=True,
                             default=str))
        except Exception as e:  # REPL: report, keep reading
            print(f"error: {e}", file=sys.stderr)
    return 0


def _cmd_echo(args) -> int:
    """`benthos echo` (lib/service/run.go:225-254): parse the config
    and print a normalised version after environment variables have
    been resolved.  Deviation: the reference materialises every
    schema default into the output; our configs are sparse-by-design,
    so echo emits the env-resolved, canonically-ordered config as
    given, with `--set path=value` overrides applied (readConfig's
    --set, lib/config)."""
    import yaml

    from benthos_spark.stream import load_config
    try:
        conf = load_config(args.config)
    except Exception as e:
        print(f"Echo error: {e}", file=sys.stderr)
        return 1
    for item in args.set or []:
        path, sep, raw = item.partition("=")
        if not sep:
            print(f"Echo error: --set expects path=value, got {item!r}",
                  file=sys.stderr)
            return 1
        value = yaml.safe_load(raw)
        node = conf
        keys = path.split(".")
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value
    print(yaml.safe_dump(conf, sort_keys=False, default_flow_style=False),
          end="")
    return 0


def _cmd_test(args) -> int:
    from benthos_spark.session import get_spark
    from benthos_spark.testkit import run_test_file
    spark = get_spark("benthos-spark-test")
    failures = run_test_file(spark, args.path, verbose=True)
    return 1 if failures else 0


def _cmd_streams(args) -> int:
    """`benthos streams` (lib/service/run.go:258-287): serve named-
    stream CRUD + stats over HTTP until interrupted."""
    from benthos_spark.api import StreamsAPI
    from benthos_spark.session import get_spark
    from benthos_spark.streaming.manager import StreamManager
    spark = get_spark("benthos-spark-streams")
    mgr = StreamManager(spark)
    for conf in args.config or []:
        import os
        name = os.path.splitext(os.path.basename(conf))[0]
        mgr.create(name, conf)
    api = StreamsAPI(mgr, host=args.host, port=args.port)
    host, port = api.start()
    print(f"streams API listening on http://{host}:{port}")
    try:
        import signal
        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        api.stop()
        mgr.stop_all()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="benthos_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="execute a config")
    run_p.add_argument("-c", "--config", required=True)
    run_p.add_argument("--show", type=int, default=0,
                       help="show N result rows")
    run_p.set_defaults(fn=_cmd_run)

    lint_p = sub.add_parser("lint", help="validate a config without running")
    lint_p.add_argument("-c", "--config", required=True)
    lint_p.add_argument("--explain", action="store_true",
                        help="print the optimized plan")
    lint_p.set_defaults(fn=_cmd_lint)

    blobl_p = sub.add_parser("blobl", help="Bloblang REPL over stdin JSON")
    blobl_p.add_argument("mapping")
    blobl_p.set_defaults(fn=_cmd_blobl)

    echo_p = sub.add_parser(
        "echo", help="parse a config and echo back a normalised version")
    echo_p.add_argument("-c", "--config", required=True)
    echo_p.add_argument("--set", action="append", metavar="PATH=VALUE",
                        help="override a config field (dotted path)")
    echo_p.set_defaults(fn=_cmd_echo)

    test_p = sub.add_parser("test", help="run YAML golden test cases")
    test_p.add_argument("path")
    test_p.set_defaults(fn=_cmd_test)

    streams_p = sub.add_parser("streams",
                               help="serve the streams-mode REST API")
    streams_p.add_argument("-c", "--config", action="append",
                           help="stream config file(s) to load at boot "
                                "(name = filename stem)")
    streams_p.add_argument("--host", default="127.0.0.1")
    streams_p.add_argument("--port", type=int, default=4195)
    streams_p.set_defaults(fn=_cmd_streams)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
