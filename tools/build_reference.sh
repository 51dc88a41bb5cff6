#!/bin/bash
# Build the reference Dart (read-only at /root/reference) in /tmp for
# golden-output generation and benchmarking. The vendored htslib 1.5
# needs a bzlib.h stub on systems without libbz2 dev headers.
set -e
REF=/root/reference
DST=/tmp/dart_ref
if [ -x "$DST/bin/dart" ]; then
  echo "reference already built at $DST/bin"
  exit 0
fi
rm -rf "$DST"
cp -r "$REF" "$DST"
chmod -R u+w "$DST"
if [ ! -f /usr/include/bzlib.h ]; then
  cat > "$DST/src/htslib/bzlib.h" <<'EOF'
#ifndef _BZLIB_H
#define _BZLIB_H
#define BZ_OK 0
#ifdef __cplusplus
extern "C" {
#endif
int BZ2_bzBuffToBuffCompress(char* dest, unsigned int* destLen,
                             char* source, unsigned int sourceLen,
                             int blockSize100k, int verbosity, int workFactor);
int BZ2_bzBuffToBuffDecompress(char* dest, unsigned int* destLen,
                               char* source, unsigned int sourceLen,
                               int small, int verbosity);
#ifdef __cplusplus
}
#endif
#endif
EOF
fi
mkdir -p "$DST/libs"
ln -sf /usr/lib/x86_64-linux-gnu/libbz2.so.1 "$DST/libs/libbz2.so" 2>/dev/null || true
cd "$DST/src/htslib" && make -j8 libhts.a
cd "$DST/src/BWT_Index" && make -j8
mkdir -p "$DST/bin"
cp "$DST/src/BWT_Index/bwt_index" "$DST/bin/" 2>/dev/null || true
cd "$DST/src"
make LIB="-L$DST/libs -lz -lm -lbz2 -llzma -lpthread -lstdc++"
cp "$DST/src/dart" "$DST/bin/" 2>/dev/null || true
ls -la "$DST/bin/"
