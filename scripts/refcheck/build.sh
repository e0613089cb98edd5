#!/bin/bash
# Build the reference-validation harness.  Compiles the reference sources
# *in place* (read-only mount is fine for -c) — no reference code is
# copied into this repo.  CSimulate.cpp (stray token at :123) and
# main.cpp / CChannel.cpp (MKL RNG) are not needed: the harness
# re-implements their driver role in scripts/refcheck/harness.cpp.
set -euo pipefail
REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
BUILD=${BUILD:-"$HERE/../../.refbuild"}
mkdir -p "$BUILD"

CXX=${CXX:-g++}
FLAGS="-O2 -std=c++11 -mavx2 -mavx512vl -mavx512bw -I$HERE -I$REF -w"

for src in CLDPC CDecoder_OMS CDecoder_FAID CDecoder_OMSBF \
           CDecoder_OMS_DTBF CDecoder_FAID_2B1C CTool CModulate; do
    obj="$BUILD/$src.o"
    if [ ! -f "$obj" ] || [ "$REF/$src.cpp" -nt "$obj" ]; then
        echo "CC $src.cpp"
        $CXX $FLAGS -c "$REF/$src.cpp" -o "$obj"
    fi
done
echo "CC harness.cpp"
$CXX $FLAGS -c "$HERE/harness.cpp" -o "$BUILD/harness.o"
$CXX $FLAGS "$BUILD"/*.o -o "$BUILD/refharness"
echo "built $BUILD/refharness"
