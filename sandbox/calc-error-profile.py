#!/usr/bin/env python
"""Reference-free per-position mismatch error profile from k-mer
abundances: consume reads until coverage saturates (median >= C), then
collect spectral error positions from saturated reads into a
position histogram, normalized for read length.

Behavioral peer of the reference's error profiler (reference
sandbox/calc-error-profile.py:36-185): same saturation predicate, same
'.errhist' output columns (position error_count error_fraction), same
non-zero exit when the stream never saturates.

usage: sandbox/calc-error-profile.py [-o outfile] <infile> [...]
"""

import argparse
import os
import sys

from _sandbox import iter_records

from khmer_tpu import Countgraph

K = 20
COVERAGE = 10
TABLE = 1e7
REPORT_EVERY = 25000
READ_CAP = 1e8
CHECKED_CAP = 2e5


class Profiler:
    """Streaming state: a countgraph fed by unsaturated reads, and an
    error-position histogram fed by saturated ones."""

    def __init__(self, per_read_out=None):
        self.graph = Countgraph(K, TABLE, 4)
        self.hist = {}
        self.read_lengths = []
        self.n_fed = 0
        self.n_profiled = 0
        self.bp_fed = 0
        self.per_read_out = per_read_out

    def saturated(self):
        """The reference's exit predicate: profiling has caught up
        with feeding, or enough reads are profiled."""
        return (self.n_profiled >= self.n_fed
                or self.n_profiled > CHECKED_CAP)

    def offer(self, record):
        seq = record.sequence.replace('N', 'A')
        if len(seq) < K:
            return
        median, _, _ = self.graph.get_median_count(seq)
        if median < COVERAGE:
            self.graph.consume(seq)
            self.n_fed += 1
            self.bp_fed += len(seq)
        else:
            spots = self.graph.find_spectral_error_positions(seq, 2)
            if self.per_read_out:
                print(record.name, ",".join(map(str, spots)),
                      file=self.per_read_out)
            for p in spots:
                self.hist[p] = self.hist.get(p, 0) + 1
            self.read_lengths.append(len(seq))
            self.n_profiled += 1

    def write_histogram(self, out):
        """Columns: position error_count error_fraction, length-
        normalized (fraction of reads long enough to host an error at
        that position)."""
        longest = max(self.read_lengths)
        at_least = [sum(1 for L in self.read_lengths if L >= pos)
                    for pos in range(longest)]
        out.write('position error_count error_fraction\n')
        for pos in range(longest):
            errs = self.hist.get(pos, 0)
            print(pos, errs, errs / float(at_least[pos]), file=out)

    def error_rate(self):
        return sum(self.hist.values()) / float(sum(self.read_lengths))


def run(filenames, out, per_read_out=None, log=sys.stderr):
    prof = Profiler(per_read_out)
    total = 0
    for filename in filenames:
        print('opening', filename, file=log)
        for record in iter_records(filename):
            total += 1
            if total % REPORT_EVERY == 0:
                print('...', total, prof.n_fed, prof.n_profiled,
                      file=log)
                if total >= READ_CAP or prof.saturated():
                    break
            prof.offer(record)

    if not prof.read_lengths:
        print('** no saturated reads seen; no profile to write',
              file=log)
        sys.exit(-1)
    prof.write_histogram(out)

    print('', file=log)
    print('total sequences:', total, file=log)
    print('n consumed:', prof.n_fed, file=log)
    print('n checked:', prof.n_profiled, file=log)
    print('bp consumed:', prof.bp_fed, prof.bp_fed / float(COVERAGE),
          file=log)
    print('error rate: %.2f%%' % (100.0 * prof.error_rate()), file=log)
    return prof


def main():
    ap = argparse.ArgumentParser(
        "Calculate read error profile based on k-mer abundances of "
        "shotgun data.")
    ap.add_argument('filenames', nargs='+')
    ap.add_argument('-o', '--output', dest='output_file',
                    type=argparse.FileType('w'), default=None,
                    help="histogram output; defaults to "
                         "<first filename>.errhist in cwd.")
    ap.add_argument('--errors-per-read', dest='errors_per_read',
                    type=argparse.FileType('w'), default=None)
    args = ap.parse_args()

    out = args.output_file
    outname = out.name if out else \
        os.path.basename(args.filenames[0]) + '.errhist'
    if out is None:
        out = open(outname, 'w')

    prof = run(args.filenames, out, args.errors_per_read)
    out.close()
    print('Error histogram is in %s' % outname, file=sys.stderr)

    if not prof.saturated():
        print("\n** WARNING: not enough reads to get a good result\n"
              "** Is this high diversity sample / small subset?",
              file=sys.stderr)
        sys.exit(-1)


if __name__ == '__main__':
    main()
