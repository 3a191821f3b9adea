#!/bin/bash
# Rebuild the UNMODIFIED reference liboxli + the refbench oracle driver
# (tests/golden/refbench.cc) into $BUILD (default /tmp/refbuild). ~2
# min. Used to regenerate the BASELINE numbers and the full-scale md5
# goldens (tests/test_fullscale_oracles.py).
set -e
REPO=$(cd "$(dirname "$0")/../.." && pwd)
BUILD=${BUILD:-/tmp/refbuild}
mkdir -p "$BUILD"
cd "$BUILD"
REF=/root/reference
INC="-I$REF/include -I$REF/third-party/seqan/core/include -I$REF/third-party/smhasher -I$REF/third-party/rollinghash -I$REF/third-party/cqf -I$REF/third-party/bzip2 -I$REF/third-party/zlib"
FLAGS="-O3 -std=c++11 -w -DSEQAN_HAS_ZLIB=1 -DSEQAN_HAS_BZIP2=1"
mkdir -p obj
for f in $REF/src/oxli/*.cc $REF/third-party/smhasher/MurmurHash3.cc; do
  o=obj/$(basename $f .cc).o
  [ -f $o ] || g++ $FLAGS $INC -c $f -o $o &
done
wait
# bundled cqf (C)
[ -f obj/gqf.o ] || gcc -O3 -w -I$REF/third-party/cqf -c $REF/third-party/cqf/gqf.c -o obj/gqf.o
# bundled bzip2 objects
for f in blocksort huffman crctable randtable compress decompress bzlib; do
  [ -f obj/bz_$f.o ] || gcc -O3 -w -c $REF/third-party/bzip2/$f.c -o obj/bz_$f.o
done
g++ $FLAGS $INC "$REPO/tests/golden/refbench.cc" obj/*.o -o refbench -lz -lpthread
echo built
