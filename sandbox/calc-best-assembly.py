#!/usr/bin/env python
"""Pick the assembly FASTA with the most bp in contigs above a cutoff.

Scores every candidate assembly by total bases in contigs of at least
-C bp, reports each score to stderr, prints the winning filename to
stdout, and optionally copies the winner to -o. Behavioral contract of
reference sandbox/calc-best-assembly.py:36-92.

% python sandbox/calc-best-assembly.py [-C cutoff] [-o out.fa] <fa1> <fa2>...
"""

import argparse
import sys

from _sandbox import iter_records

DEFAULT_SIZE_CUTOFF = 500


def assembly_score(filename, cutoff):
    """Total bp across contigs >= cutoff; None if unreadable."""
    try:
        return sum(len(r.sequence) for r in iter_records(filename)
                   if len(r.sequence) >= cutoff)
    except IOError:
        return None


def rank_assemblies(filenames, cutoff, quiet=False):
    """[(score, filename)] best-first, skipping unreadable inputs."""
    scored = []
    for filename in filenames:
        score = assembly_score(filename, cutoff)
        if score is None:
            print("** WARNING: %s does not exist, skipping" % filename,
                  file=sys.stderr)
            continue
        if not quiet:
            print("assembly %s has %d bp > %d" % (filename, score, cutoff),
                  file=sys.stderr)
        scored.append((score, filename))
    return sorted(scored, reverse=True)


def main():
    parser = argparse.ArgumentParser(
        description="pick the best assembly by bp above a size cutoff")
    parser.add_argument('-C', '--cutoff', type=int,
                        default=DEFAULT_SIZE_CUTOFF)
    parser.add_argument('-o', '--output-file', dest='output_file',
                        type=argparse.FileType('w'))
    parser.add_argument('-q', '--quiet', type=bool)
    parser.add_argument('assembly_files', nargs='+')
    args = parser.parse_args()

    ranking = rank_assemblies(args.assembly_files, args.cutoff, args.quiet)
    best_total, winner = ranking[0]
    print('----', file=sys.stderr)
    print("assembly %s wins: %d total bp > %d"
          % (winner, best_total, args.cutoff), file=sys.stderr)

    if args.output_file:
        for record in iter_records(winner):
            args.output_file.write('>%s\n%s\n'
                                   % (record.name, record.sequence))
    print(winner)


if __name__ == '__main__':
    main()
