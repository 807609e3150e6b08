#!/bin/bash
# Build the RGKrt reference renderer (/root/reference) against the
# hand-written shims in this directory (mini-glm, mini-assimp OBJ-only,
# png++ over libpng).  Objects and the binary land in
# tools/refbuild/build/ — nothing is written to /root/reference.
#
# Usage: tools/refbuild/build.sh   ->  tools/refbuild/build/RGKrt
set -e
cd "$(dirname "$0")"
REF=/root/reference
OUT=build
mkdir -p "$OUT"

CXX=${CXX:-g++}
EXR_CFLAGS=$(pkg-config --cflags OpenEXR)
CXXFLAGS="-std=gnu++11 -O3 -Wall -w -pthread
  -Iinclude
  -isystem $REF/external
  $EXR_CFLAGS"

SRCS=$(ls $REF/src/*.cpp $REF/src/LTC/*.cpp $REF/src/bxdf/*.cpp \
          $REF/external/*.cpp)
SRCS="$SRCS assimp_obj.cpp"

OBJS=""
for s in $SRCS; do
  o="$OUT/$(echo "$s" | sed 's#[/.]#_#g').o"
  OBJS="$OBJS $o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ]; then
    echo "CXX $s"
    $CXX $CXXFLAGS -c "$s" -o "$o" &
    while [ "$(jobs -r | wc -l)" -ge "$(nproc)" ]; do wait -n; done
  fi
done
wait

echo "LINK $OUT/RGKrt"
$CXX $OBJS -o "$OUT/RGKrt" \
  $(pkg-config --libs OpenEXR libpng) -ljpeg -pthread
echo OK
