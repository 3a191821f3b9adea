/* khmer_tpu host tier — public C API (libkhmer_tpu_host.so)
 *
 * The native latency tier behind khmer_tpu's Python dispatch
 * (khmer_tpu/core/hostengine.py). Everything here operates on plain
 * caller-owned buffers, so the library is usable from any language
 * with a C FFI; see examples/c-api/ for a complete program.
 *
 * Conventions
 *   - DNA is 2-bit coded: A=0, T=1, C=2, G=3 (reference
 *     include/oxli/kmer_hash.hh:62-96; src/fastx_io.cc emits this).
 *   - `kind` selects the table storage: 0 = bit (Bloom/Nodegraph),
 *     1 = byte (Count-Min/Countgraph), 2 = nibble (SmallCountgraph).
 *   - `tables` is an array of n_tables pointers, table t holding
 *     primes[t] counters of the kind's width (bits are packed LSB
 *     first into bytes; nibbles pack even bins into the high half).
 *   - Canonical hashing: family 0 = reversible 2-bit rolling hash
 *     min(fwd, rc); family 1 = MurmurHash3_x64_128 fwd^rc
 *     (reference src/oxli/kmer_hash.cc:65-208). k <= 32.
 *
 * This header covers the stable counting/query surface; the graph,
 * diginorm, trimming, HLL, partitioning and aligner entry points in
 * hostgraph.cc follow the same conventions and are documented at
 * their definitions.
 */
#ifndef KHMER_TPU_HOST_H
#define KHMER_TPU_HOST_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Dense canonical window hashes of a flat packed chunk. `starts` are
 * ascending read-start offsets within `codes` (entries >= nfill are
 * padding); windows never span a read boundary. Writes one hash per
 * real k-mer, in stream order; returns the count (<= nfill). */
long long hg_hash_dense(
    const uint8_t* codes, long long nfill,
    const int32_t* starts, long long nstarts,
    int k, int family, uint64_t* out);

/* Same contract over a block of reads given as (offset, length) rows
 * (one call per parser block; no per-read FFI cost). */
long long hg_hash_dense_reads(
    const uint8_t* codes, const int64_t* offs, const int64_t* lens,
    long long n_reads, int k, int family, uint64_t* out);

/* Commit pre-hashed canonical k-mers, one sequential add each
 * (reference Storage::add semantics: saturating counters, new-k-mer
 * and occupied-bin accounting into the _io accumulators). Returns the
 * number of new k-mers. With track_saturation != 0, hashes whose
 * count crosses 255 are appended to sat_out (capacity sat_cap; count
 * in *sat_n; returns -1 if the capacity is exceeded). */
long long hg_add_hashes(
    int kind, uint8_t** tables, const uint64_t* primes, int n_tables,
    const uint64_t* hashes, long long n,
    uint64_t* n_unique_io, uint64_t* n_occupied_io,
    int track_saturation, uint64_t* sat_out, long long sat_cap,
    long long* sat_n);

/* Min-over-tables counts for pre-hashed canonical k-mers. */
void hg_get_counts(
    int kind, uint8_t** tables, const uint64_t* primes, int n_tables,
    const uint64_t* hashes, long long n, uint32_t* out);

/* Per-read median/average/stddev of k-mer counts (reference
 * Hashtable::get_median_count, src/oxli/hashtable.cc:299-328).
 * Reads shorter than k get median -1. */
void hg_median_counts(
    int kind, uint8_t** tables, const uint64_t* primes, int n_tables,
    int k, const uint8_t* codes, const int64_t* starts,
    const int64_t* ends, long long n_reads,
    int32_t* median_out, float* avg_out, float* std_out);

#ifdef __cplusplus
}
#endif

#endif /* KHMER_TPU_HOST_H */
