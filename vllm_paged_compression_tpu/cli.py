"""Command line interface (reference vllm/scripts.py: `vllm serve`)."""

from __future__ import annotations

import argparse

from .engine.arg_utils import EngineArgs


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(prog="vpc-tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    serve_p = sub.add_parser("serve", help="start the OpenAI-compatible "
                                           "API server")
    serve_p.add_argument("--host", type=str, default="0.0.0.0")
    serve_p.add_argument("--port", type=int, default=8000)
    serve_p.add_argument("--tool-call-parser", type=str, default="auto",
                         choices=["auto", "hermes", "json"],
                         help="how to extract tool calls from chat "
                              "completions (reference "
                              "openai/tool_parsers/)")
    EngineArgs.add_cli_args(serve_p)

    args = parser.parse_args(argv)
    if args.command == "serve":
        from .entrypoints.openai.api_server import run_server
        run_server(EngineArgs.from_cli_args(args), host=args.host,
                   port=args.port, tool_call_parser=args.tool_call_parser)


if __name__ == "__main__":
    main()
