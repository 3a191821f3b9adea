/* Stream a FASTQ file through the native parser + dense hasher +
 * counting tables, entirely in C — the native peer of the reference's
 * examples/c++-api/consume.cc, using both host-tier libraries:
 * libkhmer_tpu_io.so (fastq_pack: parse/clean/2-bit-encode at memory
 * bandwidth) and libkhmer_tpu_host.so (hash + count).
 *
 * Build + run:  make && ./consume reads.fastq
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "../../src/khmer_tpu_host.h"

/* from libkhmer_tpu_io.so (src/fastx_io.cc) */
extern long long fastq_pack(const char* buf, long long len,
                            uint8_t* codes, long long* meta,
                            long long max_records, long long* consumed,
                            long long* codes_used);

#define K 20
#define KIND_BYTE 1
#define FAMILY_TWOBIT 0

int main(int argc, char** argv) {
    const char* path = argc > 1 ? argv[1] : "reads.fastq";
    FILE* f = fopen(path, "rb");
    if (!f) { perror(path); return 1; }
    fseek(f, 0, SEEK_END);
    long long len = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = malloc(len);
    if (fread(buf, 1, len, f) != (size_t)len) { perror("read"); return 1; }
    fclose(f);

    /* parse + clean + 2-bit pack the whole file in one call */
    uint8_t* codes = malloc(len);
    long long* meta = malloc(4 * 100000 * sizeof(long long));
    long long consumed = 0, codes_used = 0;
    long long n_reads = fastq_pack(buf, len, codes, meta, 100000,
                                   &consumed, &codes_used);
    if (n_reads < 0) { fprintf(stderr, "malformed FASTQ\n"); return 1; }

    /* dense canonical hashes, one C call for the whole block */
    int64_t* offs = malloc(n_reads * sizeof(int64_t));
    int64_t* lens = malloc(n_reads * sizeof(int64_t));
    for (long long i = 0; i < n_reads; i++) {
        offs[i] = meta[4 * i];
        lens[i] = meta[4 * i + 1];
    }
    uint64_t* hashes = malloc((codes_used + 1) * sizeof(uint64_t));
    long long n_kmers = hg_hash_dense_reads(codes, offs, lens, n_reads,
                                            K, FAMILY_TWOBIT, hashes);

    /* count into 4 prime-sized byte tables */
    uint64_t primes[4] = {999983, 999979, 999961, 999959};
    uint8_t* tables[4];
    for (int t = 0; t < 4; t++) tables[t] = calloc(primes[t], 1);
    uint64_t n_unique = 0, n_occupied = 0;
    hg_add_hashes(KIND_BYTE, tables, primes, 4, hashes, n_kmers,
                  &n_unique, &n_occupied, 0, NULL, 0, NULL);

    printf("%lld reads, %lld k-mers, %llu distinct\n", n_reads,
           n_kmers, (unsigned long long)n_unique);

    /* per-read coverage stats */
    int64_t* ends = malloc(n_reads * sizeof(int64_t));
    for (long long i = 0; i < n_reads; i++) ends[i] = offs[i] + lens[i];
    int32_t* med = malloc(n_reads * sizeof(int32_t));
    float* avg = malloc(n_reads * sizeof(float));
    float* dev = malloc(n_reads * sizeof(float));
    hg_median_counts(KIND_BYTE, tables, primes, 4, K, codes, offs,
                     ends, n_reads, med, avg, dev);
    long long at_least_2 = 0;
    for (long long i = 0; i < n_reads; i++)
        if (med[i] >= 2) at_least_2++;
    printf("%lld reads with median coverage >= 2\n", at_least_2);
    return n_kmers > 0 ? 0 : 1;
}
