/* De Bruijn graph membership on a Bloom filter (bit storage) through
 * the khmer_tpu host-tier C API — the native peer of the reference's
 * examples/c++-api/bloom.cc: insert the k-mers of one sequence, then
 * probe for presence/absence.
 *
 * Build + run:  make && ./bloom
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../../src/khmer_tpu_host.h"

#define K 15
#define KIND_BIT 0
#define FAMILY_TWOBIT 0

static void encode(const char* seq, uint8_t* out) {
    for (; *seq; seq++, out++) {
        switch (*seq) {
            case 'T': case 't': *out = 1; break;
            case 'C': case 'c': *out = 2; break;
            case 'G': case 'g': *out = 3; break;
            default: *out = 0;
        }
    }
}

static long long hash_one(const char* kmer, uint64_t* h) {
    uint8_t codes[64];
    int32_t start = 0;
    encode(kmer, codes);
    return hg_hash_dense(codes, (long long)strlen(kmer), &start, 1, K,
                         FAMILY_TWOBIT, h);
}

int main(void) {
    /* two prime-sized bit tables (bits packed 8/byte) */
    uint64_t primes[2] = {100003, 100019};
    uint8_t* t0 = calloc((primes[0] + 7) / 8, 1);
    uint8_t* t1 = calloc((primes[1] + 7) / 8, 1);
    uint8_t* tables[2] = {t0, t1};

    const char* seq =
        "GCTGCACCGATGTACGCAAAGCTATTTAAAACCATAACTATTCTCACTTA";
    uint8_t codes[128];
    int32_t start = 0;
    encode(seq, codes);
    uint64_t hashes[128];
    long long n = hg_hash_dense(codes, (long long)strlen(seq), &start,
                                1, K, FAMILY_TWOBIT, hashes);

    uint64_t n_unique = 0, n_occupied = 0;
    hg_add_hashes(KIND_BIT, tables, primes, 2, hashes, n, &n_unique,
                  &n_occupied, 0, NULL, 0, NULL);
    printf("inserted %lld k-mers (%llu distinct)\n", n,
           (unsigned long long)n_unique);

    uint64_t probe;
    uint32_t present;
    hash_one("GCTGCACCGATGTAC", &probe);      /* prefix of seq */
    hg_get_counts(KIND_BIT, tables, primes, 2, &probe, 1, &present);
    printf("k-mer from the sequence: %s\n",
           present ? "present" : "absent");
    int ok = present == 1;

    hash_one("TTTTTTTTTTTTTTT", &probe);      /* never inserted */
    hg_get_counts(KIND_BIT, tables, primes, 2, &probe, 1, &present);
    printf("foreign k-mer:           %s\n",
           present ? "present" : "absent");
    ok = ok && present == 0;

    printf(ok ? "OK\n" : "UNEXPECTED\n");
    free(t0); free(t1);
    return ok ? 0 : 1;
}
