/* Exact k-mer counting straight against the khmer_tpu host-tier C API
 * (libkhmer_tpu_host.so) — the native-code peer of the reference's
 * examples/c++-api/exact-counting.cc: a table sized well above the
 * number of distinct k-mers makes the Count-Min collision probability
 * negligible, so reported counts are exact.
 *
 * Build + run:  make && ./exact-counting
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../../src/khmer_tpu_host.h"

#define K 21
#define KIND_BYTE 1
#define FAMILY_TWOBIT 0

static const char* READS[] = {
    "GCTGCACCGATGTACGCAAAGCTATTTAAAACCATAACTATTCTCACTTA",
    "TTTAAAACCATAACTATTCTCACTTAGCTGCACCGATGTACGCAAAGCTA",
    "GCTGCACCGATGTACGCAAAGCTATTTAAAACCATAACTATTCTCACTTA",
};

static void encode(const char* seq, uint8_t* out) {
    /* A=0, T=1, C=2, G=3; anything else cleans to A (reference
     * src/oxli/read_parsers.cc:53-69) */
    for (; *seq; seq++, out++) {
        switch (*seq) {
            case 'T': case 't': *out = 1; break;
            case 'C': case 'c': *out = 2; break;
            case 'G': case 'g': *out = 3; break;
            default: *out = 0;
        }
    }
}

int main(void) {
    /* one prime-sized byte table, far larger than the ~80 distinct
     * k-mers below -> exact counts */
    uint64_t primes[1] = {1000003};
    uint8_t* table = calloc(primes[0], 1);
    uint8_t* tables[1] = {table};

    /* pack the reads back-to-back and hash densely in one call */
    long long n_reads = sizeof(READS) / sizeof(*READS);
    int64_t offs[8], lens[8];
    long long total = 0;
    for (long long i = 0; i < n_reads; i++) {
        offs[i] = total;
        lens[i] = (int64_t)strlen(READS[i]);
        total += lens[i];
    }
    uint8_t* codes = malloc(total);
    for (long long i = 0; i < n_reads; i++)
        encode(READS[i], codes + offs[i]);
    uint64_t* hashes = malloc(total * sizeof(uint64_t));
    long long n_kmers = hg_hash_dense_reads(
        codes, offs, lens, n_reads, K, FAMILY_TWOBIT, hashes);

    /* sequential adds with new-k-mer accounting */
    uint64_t n_unique = 0, n_occupied = 0;
    hg_add_hashes(KIND_BYTE, tables, primes, 1, hashes, n_kmers,
                  &n_unique, &n_occupied, 0, NULL, 0, NULL);
    printf("consumed %lld k-mers from %lld reads; %llu distinct\n",
           n_kmers, n_reads, (unsigned long long)n_unique);

    /* query: reads 0 and 2 are identical and read 1 is a rotation, so
     * the first k-mer of read 0 recurs in all three */
    uint32_t* counts = malloc(n_kmers * sizeof(uint32_t));
    hg_get_counts(KIND_BYTE, tables, primes, 1, hashes, n_kmers,
                  counts);
    printf("first k-mer of read 0: count %u\n", counts[0]);

    /* per-read median coverage */
    int64_t ends[8];
    for (long long i = 0; i < n_reads; i++) ends[i] = offs[i] + lens[i];
    int32_t med[8];
    float avg[8], dev[8];
    hg_median_counts(KIND_BYTE, tables, primes, 1, K, codes, offs,
                     ends, n_reads, med, avg, dev);
    for (long long i = 0; i < n_reads; i++)
        printf("read %lld: median %d  average %.2f\n", i, med[i],
               avg[i]);

    int rc = (counts[0] == 3 && med[0] == 2 && med[1] == 1) ? 0 : 1;
    printf(rc == 0 ? "OK\n" : "UNEXPECTED COUNTS\n");
    free(counts); free(hashes); free(codes); free(table);
    return rc;
}
