#!/usr/bin/env python
"""
Estimate optimal choice of hash table parameters.

Sandbox-tier equivalent of reference sandbox/estimate_optimal_hash.py:37-134.

First scenario: known number of k-mers N and memory size M; find the
table count/size minimizing the false positive rate:
% sandbox/estimate_optimal_hash.py <number_of_kmers> -M <size_of_memory>

Second scenario: known N and a target false positive rate f; find the
minimum memory:
% sandbox/estimate_optimal_hash.py <number_of_kmers> -f <desired_fpr>

Use '-h' for parameter help.
"""

import argparse
import sys
import textwrap

from _sandbox import *  # noqa: F401,F403

import khmer_tpu
from khmer_tpu.cli.args import info, optimal_size, sanitize_help


def get_parser():
    epilog = """
    With -M: optimal table count/size for a memory budget.
    With -f: minimum memory for a target false positive rate.
    """
    parser = argparse.ArgumentParser(
        description='Estimate optimal choice of hash table parameters',
        formatter_class=argparse.RawDescriptionHelpFormatter,
        epilog=textwrap.dedent(epilog))

    parser.add_argument('-N', help='number of estimated distinct k-mers',
                        type=int)
    group = parser.add_mutually_exclusive_group()
    group.add_argument('-M', help='size of memory available to use',
                       type=int)
    group.add_argument('-f', help='desired maximum false positive rate',
                       type=float)
    parser.add_argument('--version', action='version', version='%(prog)s '
                        + khmer_tpu.__version__)
    return parser


def main():
    info('estimate_optimal_hash.py', ['counting'])
    args = sanitize_help(get_parser()).parse_args()
    num = args.N
    if args.M:
        result = optimal_size(num, mem_cap=args.M)
        print("number of estimated distinct k-mers:  ", num,
              file=sys.stderr)
        print("size of memory available to use:      ", args.M,
              file=sys.stderr)
    elif args.f:
        result = optimal_size(num, fp_rate=args.f)
        print("number of estimated distinct k-mers:  ", num,
              file=sys.stderr)
        print("desired maximum false positive rate:  ", args.f,
              file=sys.stderr)
    else:
        get_parser().error('No action requested, add -M (size of memory '
                           'available to use) or -f (desired maximum false '
                           'positive rate)')
        return

    print("optimal number of hash tables:        ", result.num_htables,
          file=sys.stderr)
    print("optimal size of hash tables:          ", result.htable_size,
          file=sys.stderr)
    print("estimated false positive rate:        ", result.fp_rate,
          file=sys.stderr)
    print("estimated usage of memory:            ", result.mem_use,
          file=sys.stderr)


if __name__ == '__main__':
    main()
