"""Runnable server entry point — the reference's main()
(`duo/src/main.rs:40-125`) as ``python -m duo_spark``.

    python -m duo_spark serve --data-dir ./duo-data \\
        [--web-port 3000] [--ingest-port 6000] [--memory-mode] \\
        [--trigger-seconds 5] [--collect-self]

Boots the full stack the same way the reference does: ingest listener
(the JSON-TCP stand-in for its gRPC port, DEVIATIONS.md #5), the
continuous micro-batch pipelines, and the HTTP query routes. With
``--memory-mode`` nothing persists (main.rs:60-63); with
``--collect-self`` the server traces its own request handling through
a DuoSubscriber pointed at its own ingest port (main.rs:97-111),
excluding the subscriber's internals to avoid recursion.
"""

from __future__ import annotations

import argparse
import signal
import sys

DUO_BANNER = r"""
 █████  ██    ██  ██████     ███ ███ ██████ ██████ ██████ ██   ██
 ██  ██ ██    ██ ██    ██    ██     ██   ██ ██  ██ ██  ██ ██  ██
 ██  ██ ██    ██ ██    ██    ███ ██ ██████ ██████ ██████ █████
 ██  ██ ██    ██ ██    ██       ███ ██     ██  ██ ██ ██  ██  ██
 █████   ██████   ██████    ███ ██ ██     ██  ██ ██  ██ ██   ██
"""


def serve(argv: list[str]) -> int:
    p = argparse.ArgumentParser(prog="python -m duo_spark serve")
    p.add_argument("--data-dir", default="./duo-data",
                   help="store root (parquet partitions, checkpoints, registries)")
    p.add_argument("--web-port", type=int, default=3000)
    p.add_argument("--ingest-port", type=int, default=6000)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--memory-mode", action="store_true",
                   help="never persist collected data (local development)")
    p.add_argument("--trigger-seconds", type=int, default=5,
                   help="micro-batch cadence of the ingest pipelines")
    p.add_argument("--collect-self", action="store_true",
                   help="trace the server's own request handling")
    args = p.parse_args(argv)

    from duo_spark.engine import DuoEngine
    from duo_spark.session import get_spark

    print(DUO_BANNER)
    if args.memory_mode:
        print("Running in memory mode, all data will be lost after the process exits")
    spark = get_spark("duo-serve")
    engine = DuoEngine(
        spark, args.data_dir,
        memory_mode=args.memory_mode,
        trigger_seconds=args.trigger_seconds,
    )
    ingest_addr = engine.start_ingest(host=args.host, port=args.ingest_port)
    engine.start_pipelines()

    request_hook = None
    if args.collect_self:
        from duo_spark.subscriber import DuoSubscriber

        sub = DuoSubscriber(*ingest_addr, "duo")
        request_hook = lambda path: sub.span("http.request", path=path)  # noqa: E731

    web_addr = engine.serve_http(
        host=args.host, port=args.web_port, request_hook=request_hook
    )

    print(f"ingest: tcp://{ingest_addr[0]}:{ingest_addr[1]}")
    print(f"web:    http://{web_addr[0]}:{web_addr[1]}/api/logs")

    stop = {"flag": False}

    def _sig(*_args):
        stop["flag"] = True

    signal.signal(signal.SIGINT, _sig)
    signal.signal(signal.SIGTERM, _sig)
    while not stop["flag"]:
        signal.pause()
    print("shutting down")
    engine.stop()
    spark.stop()
    return 0


def main() -> int:
    argv = sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0 if argv else 2
    if argv[0] == "serve":
        return serve(argv[1:])
    print(f"unknown command {argv[0]!r} (expected: serve)", file=sys.stderr)
    return 2


if __name__ == "__main__":
    sys.exit(main())
