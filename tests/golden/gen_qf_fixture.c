/* Golden-fixture generator: drives the REFERENCE CQF implementation
 * (third-party/cqf/gqf.c, compiled from /root/reference, unmodified)
 * through the same call pattern khmer's QFStorage uses
 * (include/oxli/storage.hh:413-458) and writes
 *   (a) a .qf file with the exact bytes QFStorage::save emits
 *       (src/oxli/storage.cc:919-955)
 *   (b) a .counts text file "key count" per line for parity checks.
 * Usage: gen_qf_fixture <size_log2> <n_keys> <seed> <out_base>
 */
#include <stdio.h>
#include <stdlib.h>
#include <stdint.h>
#include <string.h>
#include "gqf.h"

static uint64_t xs(uint64_t *s) {            /* xorshift64* PRNG */
    uint64_t x = *s;
    x ^= x >> 12; x ^= x << 25; x ^= x >> 27;
    *s = x;
    return x * 2685821657736338717ULL;
}

int main(int argc, char **argv)
{
    if (argc != 5) { fprintf(stderr, "args\n"); return 1; }
    int size = atoi(argv[1]);
    long n = atol(argv[2]);
    uint64_t seed = strtoull(argv[3], 0, 10);
    const char *base = argv[4];

    QF cf;
    qf_init(&cf, 1ULL << size, size + 8, 0);

    /* khmer inserts one occurrence at a time: qf_insert(key%range,0,1) */
    long i;
    for (i = 0; i < n; i++) {
        uint64_t key = xs(&seed) % cf.range;
        /* skew counts: ~1/8 of keys get repeated geometric-ish counts */
        uint64_t reps = 1;
        uint64_t r = xs(&seed) & 7;
        if (r == 0) reps = 2 + (xs(&seed) % 400);
        else if (r == 1) reps = 2 + (xs(&seed) & 3);
        uint64_t j;
        for (j = 0; j < reps; j++)
            qf_insert(&cf, key, 0, 1);
    }
    /* deterministic edge keys: remainder 0, remainder 1, quotient 0,
       last quotient (forces spill handling at the table end) */
    uint64_t edges[] = {0, 1, 255, ((1ULL << size) - 1) << 8, (5ULL << 8)};
    for (i = 0; i < 5; i++) {
        uint64_t j;
        for (j = 0; j < (uint64_t)(3 * i + 1); j++)
            qf_insert(&cf, edges[i] % cf.range, 0, 1);
    }

    char fn[512];
    snprintf(fn, sizeof fn, "%s.qf", base);
    FILE *f = fopen(fn, "wb");
    unsigned char version = 4, ht_type = 8, ksize = 20;
    fwrite("OXLI", 1, 4, f);
    fwrite(&version, 1, 1, f);
    fwrite(&ht_type, 1, 1, f);
    fwrite(&ksize, 1, 1, f);
    uint64_t tmp_range = cf.range;
    fwrite(&cf.nslots, 8, 1, f);
    fwrite(&cf.xnslots, 8, 1, f);
    fwrite(&cf.key_bits, 8, 1, f);
    fwrite(&cf.value_bits, 8, 1, f);
    fwrite(&cf.key_remainder_bits, 8, 1, f);
    fwrite(&cf.bits_per_slot, 8, 1, f);
    fwrite(&tmp_range, 8, 1, f);
    fwrite(&cf.nblocks, 8, 1, f);
    fwrite(&cf.nelts, 8, 1, f);
    fwrite(&cf.ndistinct_elts, 8, 1, f);
    fwrite(&cf.noccupied_slots, 8, 1, f);
    fwrite(cf.blocks, sizeof(qfblock), cf.nblocks, f);
    fclose(f);

    snprintf(fn, sizeof fn, "%s.counts", base);
    f = fopen(fn, "w");
    fprintf(f, "# nslots=%lu xnslots=%lu key_bits=%lu krb=%lu range=%lu "
               "nelts=%lu ndistinct=%lu noccupied=%lu\n",
            (unsigned long)cf.nslots, (unsigned long)cf.xnslots,
            (unsigned long)cf.key_bits, (unsigned long)cf.key_remainder_bits,
            (unsigned long)tmp_range, (unsigned long)cf.nelts,
            (unsigned long)cf.ndistinct_elts,
            (unsigned long)cf.noccupied_slots);
    QFi qfi;
    qf_iterator(&cf, &qfi, 0);
    uint64_t key, value, count;
    while (!qfi_end(&qfi)) {
        qfi_get(&qfi, &key, &value, &count);
        fprintf(f, "%lu %lu\n", (unsigned long)key, (unsigned long)count);
        qfi_next(&qfi);
    }
    fclose(f);
    fprintf(stderr, "wrote %s.{qf,counts}: nelts=%lu ndistinct=%lu\n",
            base, (unsigned long)cf.nelts, (unsigned long)cf.ndistinct_elts);
    return 0;
}
