"""Command-line entry points — the reference's user-facing flows as a CLI.

The reference is a VS Code extension whose three core flows are: run a
``.flinknb`` notebook cell-by-cell against the SQL gateway
(flinkNotebookController.ts), execute ad-hoc SQL statements
(sqlGatewayClient.ts:97-112), and expose the gateway's REST protocol.
This module provides the same flows without an editor:

    python -m flink_notebooks_spark run NOTEBOOK.flinknb [--save]
        Execute every code cell in order (batch statements drain fully;
        streaming statements poll then cancel, the notebook stop-button
        flow) and print per-cell results. ``--save`` writes the updated
        cell metadata (total_rows_fetched) back, like the reference's
        saved notebooks.

    python -m flink_notebooks_spark sql "STATEMENT" [...]
        Execute statements through the engine and print rows.

    python -m flink_notebooks_spark gateway [--port N]
        Serve the SQL-gateway REST protocol (sessions / statements /
        paged results; gateway.py) until interrupted.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_engine(cpus: int | None):
    from .engine import Engine
    from .session import get_spark

    return Engine(get_spark("flink-notebooks-spark-cli", cpus))


def _cmd_run(args) -> int:
    from . import notebook

    eng = _build_engine(args.cpus)
    nb = notebook.load(args.path)
    results = notebook.run(
        nb, eng, max_stream_rows=args.max_stream_rows, stream_timeout=args.stream_timeout
    )
    for res in results:
        for s in res.statements:
            head = s["sql"].strip().splitlines()[0][:72]
            kind = "stream" if s["streaming"] else "batch"
            print(f"-- cell {res.cell_index} [{kind}] {head}")
            if s["columns"]:
                print("   " + " | ".join(s["columns"]))
            for row in s["rows"][: args.max_print]:
                print("   " + " | ".join(str(v) for v in row["fields"]))
            extra = len(s["rows"]) - args.max_print
            if extra > 0:
                print(f"   ... {extra} more rows")
    if args.save:
        notebook.save(nb, args.path)
    return 0


def _cmd_sql(args) -> int:
    eng = _build_engine(args.cpus)
    for stmt_sql in args.statement:
        stmt = eng.execute_sql(stmt_sql)
        token, cols, n = 0, [], 0
        while True:
            page = stmt.fetch(token)
            cols = [c.name for c in page.columns] or cols
            if page.result_type == "PAYLOAD":
                if token == 0 and cols:
                    print(" | ".join(cols))
                for row in page.data:
                    print(" | ".join(str(v) for v in row["fields"]))
                    n += 1
                token = page.next_token
            elif page.result_type == "EOS":
                break
            else:  # NOT_READY — streaming statement filling its first page
                import time

                time.sleep(0.5)
        print(f"-- {n} rows", file=sys.stderr)
    return 0


def _cmd_gateway(args) -> int:
    from .gateway import serve
    from .session import get_spark

    server, _gw = serve(get_spark("flink-notebooks-spark-gateway", args.cpus), args.port)
    host, port = server.server_address[:2]
    print(json.dumps({"listening": f"http://{host}:{port}"}), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="python -m flink_notebooks_spark")
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores")
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="execute a .flinknb notebook")
    pr.add_argument("path")
    pr.add_argument("--save", action="store_true", help="write metadata back")
    pr.add_argument("--max-stream-rows", type=int, default=100)
    pr.add_argument("--stream-timeout", type=float, default=15.0)
    pr.add_argument("--max-print", type=int, default=20)
    pr.set_defaults(fn=_cmd_run)

    ps = sub.add_parser("sql", help="execute ad-hoc SQL statements")
    ps.add_argument("statement", nargs="+")
    ps.set_defaults(fn=_cmd_sql)

    pg = sub.add_parser("gateway", help="serve the SQL-gateway REST protocol")
    pg.add_argument("--port", type=int, default=0)
    pg.set_defaults(fn=_cmd_gateway)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
