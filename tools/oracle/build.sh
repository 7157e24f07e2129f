#!/bin/sh
# Build the reference-library oracle shared object for golden tests.
# Output: /root/repo/build/oracle.so
set -e
REF=/root/reference/src/lib
OUT=/root/repo/build
mkdir -p "$OUT"
g++ -O2 -fPIC -shared -fpermissive -w \
    -I "$REF" \
    /root/repo/tools/oracle/shim.cpp \
    "$REF"/wavelet2d.cpp "$REF"/band.cpp "$REF"/bandcodec.cpp \
    "$REF"/muxcodec.cpp "$REF"/bitcodec.cpp "$REF"/geomcodec.cpp \
    "$REF"/huffcodec.cpp \
    "$REF"/rududucodec.cpp "$REF"/image.cpp "$REF"/imagebuffer.cpp \
    "$REF"/obmc.cpp "$REF"/obme.cpp "$REF"/dct2d.cpp \
    -o "$OUT/oracle.so"
echo "built $OUT/oracle.so"
