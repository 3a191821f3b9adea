#!/usr/bin/env python
"""Train ReadAligner pair-HMM transition probabilities from a SAM
alignment against a saved countgraph.

Sandbox-tier equivalent of reference
sandbox/readaligner_pairhmm_train.py:36-237: walk each aligned read,
derive the per-base state (M/Ir/Ig from the CIGAR) x (trusted/
untrusted from the countgraph at --trusted-cutoff), accumulate state
and transition counts, and emit either the counts/probabilities table
or (--json) a ReadAligner-loadable parameter blob with log2
transition probabilities.

Uses a built-in minimal SAM text parser (the reference depends on the
optional `simplesam` package; plain SAM works with both).

% python sandbox/readaligner_pairhmm_train.py <graph.ct> <aln.sam>
"""

import argparse
import collections
import json
import re
import sys
from math import log

from _sandbox import iter_records  # noqa: F401

from khmer_tpu import load_countgraph

CIGAR_TO_STATE = {'M': 'M', 'I': 'Ir', 'D': 'Ig',
                  '=': 'M', 'X': 'M', 'S': 'Ir'}
_CIGAR_RE = re.compile(r'(\d+)([MIDNSHP=X])')


def iter_sam(fileobj):
    """Yield (seq, cigar_pairs) from a SAM text stream."""
    for line in fileobj:
        if line.startswith('@'):
            continue
        cols = line.rstrip('\n').split('\t')
        if len(cols) < 11:
            continue
        cigar = cols[5]
        seq = cols[9]
        if cigar == '*' or seq == '*':
            continue
        pairs = [(int(n), op) for n, op in _CIGAR_RE.findall(cigar)]
        yield seq, pairs


def extract_cigar(cigar_pairs):
    """Expand CIGAR run-lengths into one state per base."""
    ret = []
    for length, cig in cigar_pairs:
        state = CIGAR_TO_STATE.get(cig)
        if state is None:
            continue
        ret.extend([state] * length)
    return ret


def trusted_str(cov, trusted_cutoff):
    return '_t' if cov >= trusted_cutoff else '_u'


TRANS_ORDER = (
    ('M_t', ('M_t', 'Ir_t', 'Ig_t', 'M_u', 'Ir_u', 'Ig_u')),
    ('Ir_t', ('M_t', 'Ir_t', 'M_u', 'Ir_u')),
    ('Ig_t', ('M_t', 'Ig_t', 'M_u', 'Ig_u')),
    ('M_u', ('M_t', 'Ir_t', 'Ig_t', 'M_u', 'Ir_u', 'Ig_u')),
    ('Ir_u', ('M_t', 'Ir_t', 'M_u', 'Ir_u')),
    ('Ig_u', ('M_t', 'Ig_t', 'M_u', 'Ig_u')),
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--trusted-cutoff', type=int, default=5)
    parser.add_argument('ht', type=str,
                        help='Counting bloom filter for the reads')
    parser.add_argument('sam_file', type=str,
                        help='SAM read mapping file')
    parser.add_argument('--json', action='store_true',
                        help='output JSON')
    args = parser.parse_args()

    ht = load_countgraph(args.ht)
    k = ht.ksize()

    seq_cnt = 0
    dropped_seqs = 0
    base_cnt = {}
    state_cnts = {}
    trans_cnts = {}
    total_bases = 0.0

    with open(args.sam_file) as samfp:
        for seq, cigar_pairs in iter_sam(samfp):
            seq_cnt += 1
            if 'N' in seq:
                dropped_seqs += 1
                continue

            states = extract_cigar(cigar_pairs)
            if len(states) < len(seq) or len(seq) <= k + 1:
                dropped_seqs += 1
                continue

            kmer = seq[:k]
            state = states[k] + trusted_str(ht.get(kmer),
                                            args.trusted_cutoff)
            state_cnts[state] = state_cnts.get(state, 0) + 1
            base_cnt[kmer[-1]] = base_cnt.get(kmer[-1], 0) + 1

            for i in range(1, len(seq) - k - 1):
                total_bases += 1
                kmer = seq[i:i + k]
                cov = ht.get(kmer)

                last_state = state
                state = states[i] + trusted_str(cov, args.trusted_cutoff)

                trans = last_state + '-' + state
                trans_cnts[trans] = trans_cnts.get(trans, 0) + 1
                state_cnts[state] = state_cnts.get(state, 0) + 1
                base_cnt[kmer[-1]] = base_cnt.get(kmer[-1], 0) + 1

    if not args.json:
        print("kmer size=", k)
        print("seq count=", seq_cnt, "dropped seqs=", dropped_seqs)
        print("base counts=", base_cnt)
        print("state counts=", state_cnts)
        print("trans counts=", trans_cnts)

        trans_probs = collections.defaultdict(float)
        for trans in sorted(trans_cnts.keys()):
            start_state = trans.split('-')[0]
            trans_probs[trans] = (trans_cnts[trans] /
                                  float(state_cnts[start_state]))
            print('{0}\t{1:0.7f}'.format(trans, trans_probs[trans]))
    else:
        # unseen transitions get a large negative finite log2-prob:
        # float('-inf') would serialize as -Infinity, which is not
        # valid JSON (RFC 8259) and breaks strict parsers
        LOGP_FLOOR = -1000.0

        def logp(src, dst):
            cnt = trans_cnts.get(src + '-' + dst, 0)
            tot = state_cnts.get(src, 0)
            if cnt == 0 or tot == 0:
                return LOGP_FLOOR
            return log(cnt / float(tot), 2)

        params = {
            'scoring_matrix': [-0.06642736173897607,
                               -4.643856189774724,
                               -7.965784284662087,
                               -9.965784284662087],
            'transition_probabilities': tuple(
                tuple(logp(src, dst) for dst in dsts)
                for src, dsts in TRANS_ORDER),
        }
        print(json.dumps(params, sort_keys=True, indent=4,
                         separators=(',', ': ')))


if __name__ == '__main__':
    main()
