#!/usr/bin/env python
"""The `oxli` subcommand entry point (reference: oxli/__init__.py:46-77).

% oxli build-graph <output> <input...>
"""

import argparse
import sys
import textwrap

from khmer_tpu.cli import load_graph


def get_parser():
    parser = argparse.ArgumentParser(
        description='Single entry point script for khmer_tpu',
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    subparsers = parser.add_subparsers(dest='subcommand')

    # build-graph (== load-graph.py)
    parser_build_graph = subparsers.add_parser(
        'build-graph',
        help="Load sequences into the compressible graph format "
        "plus optional tagset",
        description="Load sequences into the compressible graph "
        "format plus optional tagset")
    load_graph_parser = load_graph.get_parser()
    for action in load_graph_parser._actions:
        if action.dest in ('help', 'version', 'info'):
            continue
        parser_build_graph._add_action(action)
    parser_build_graph.set_defaults(func=load_graph.main)

    return parser


def main():
    parser = get_parser()
    args, remainder = parser.parse_known_args()
    if args.subcommand is None:
        parser.print_help()
        sys.exit(1)
    if args.subcommand == 'build-graph':
        sys.argv = [sys.argv[0]] + sys.argv[2:]
        load_graph.main()


if __name__ == '__main__':
    main()
