#!/usr/bin/env bash
# Build the reference Disco binaries (buildG, fullsimplify, parsimplify) from the
# read-only mount at /root/reference into ./refbuild, for golden-output generation.
#
# The only source modification is replacing the SSTR() macro (an old
# dynamic_cast-on-rvalue trick that no longer compiles on g++ >= 11) with
# std::to_string — behavior-identical integer-to-string conversion.
set -euo pipefail
REF=${1:-/root/reference}
OUT=${2:-$(dirname "$0")/../refbuild}
mkdir -p "$OUT"
cp -r "$REF/src" "$OUT/"
cp "$REF/Makefile" "$OUT/" 2>/dev/null || true
cp "$REF/compiler.mk" "$OUT/" 2>/dev/null || true
chmod -R u+w "$OUT"
grep -rln "define SSTR" "$OUT/src" | while read -r f; do
  sed -i 's|#define SSTR( x ) dynamic_cast< std::ostringstream & >(( std::ostringstream() << std::dec << x ) ).str()|#define SSTR( x ) std::to_string(x)|' "$f"
done
# The Eclipse-generated makefiles mis-resolve the default goal once .d files
# exist; invoke the 'all' target explicitly.
make -C "$OUT/src/BuildGraph/Release" all READGZ=0
make -C "$OUT/src/SimplifyGraph/Release" all READGZ=0
cp "$OUT/src/BuildGraph/Release/buildG" "$OUT/"
cp "$OUT/src/SimplifyGraph/Release/fullsimplify" "$OUT/"
cp "$OUT/src/SimplifyGraph/Release/parsimplify" "$OUT/"
echo "Reference binaries in $OUT: buildG fullsimplify parsimplify"
