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
OBJS="$BUILD/CLDPC.o $BUILD/CDecoder_OMS.o $BUILD/CDecoder_OMSBF.o \
      $BUILD/CDecoder_OMS_DTBF.o $BUILD/CDecoder_FAID_2B1C.o \
      $BUILD/CTool.o $BUILD/CModulate.o $BUILD/harness.o"
$CXX $FLAGS $OBJS "$BUILD/CDecoder_FAID.o" -o "$BUILD/refharness"
echo "built $BUILD/refharness"

# LUT-family variants: the reference hard-codes `#define FAID3` at
# CDecoder_FAID.cpp:8 with alternative tables under #ifdef FAID32 /
# #ifdef FAID2 (same symbol names, so -D alone would double-define).
# Neutralize that one line into a build-dir copy and select the family
# with -D; everything else is the unmodified reference object code.
for fam in FAID32 FAID2; do
    lower=$(echo "$fam" | tr 'A-Z' 'a-z')
    src="$BUILD/CDecoder_FAID_$lower.cpp"
    obj="$BUILD/CDecoder_FAID_$lower.o"
    if [ ! -f "$obj" ] || [ "$REF/CDecoder_FAID.cpp" -nt "$obj" ]; then
        sed 's/^#define FAID3$/\/\/ LUT family selected by -D (refcheck build.sh)/' \
            "$REF/CDecoder_FAID.cpp" > "$src"
        echo "CC CDecoder_FAID.cpp [-D$fam]"
        $CXX $FLAGS -D$fam -c "$src" -o "$obj"
    fi
    $CXX $FLAGS $OBJS "$obj" -o "$BUILD/refharness_$lower"
    echo "built $BUILD/refharness_$lower"
done
