#!/usr/bin/env bash
# Build the reference Disco binaries (buildG, fullsimplify, parsimplify) from the
# read-only mount at /root/reference into ./refbuild, for golden-output generation.
#
# Source modifications applied (all are environment-compatibility / UB fixes or
# pure observability hooks; NONE change the algorithms or outputs that define
# parity):
#  1. SSTR() macro: the old dynamic_cast-on-rvalue trick no longer compiles on
#     g++ >= 11 -> std::to_string (behavior-identical int->string).
#  2. SimplifyGraph/src/OverlapGraph.cpp empty-node cleanup loops use a std::map
#     iterator AFTER erase(it) (UB; reference: OverlapGraph.cpp:342-352,677-687,
#     1320-1331,1588-1599).  On glibc 2.36 this segfaults on every fixture; on
#     the 2015-era toolchain the dangling walk happened to work.  Fixed to
#     `it = m_graph->erase(it)` — the intended semantics (drop all empty nodes).
#  3. CS2_stream/parser_cs2.h: `char pr_type[3]` overflowed by `sscanf %3s`
#     (writes 4 bytes).  At -O3 on g++ 12 this corrupts the parse and CS2
#     rejects its own input.  Widened to pr_type[4].
#  4. Observability: fullsimplify dumps the DIMACS min-cost-flow problem it
#     feeds CS2 to <prefix>_dimacs_dump.txt, and snapshots the graph to
#     <prefix>_phase_<name>_<iter>.txt after each checkpointed phase
#     (parsimplify/initial/aggressive/flow/postflow/printctg/scaffold).  These
#     extra files are inputs to our per-phase parity tests; they do not alter
#     any reference-produced output.
set -euo pipefail
REF=${1:-/root/reference}
OUT=${2:-$(dirname "$0")/../refbuild}
mkdir -p "$OUT"
cp -r "$REF/src" "$OUT/"
cp "$REF/Makefile" "$OUT/" 2>/dev/null || true
cp "$REF/compiler.mk" "$OUT/" 2>/dev/null || true
chmod -R u+w "$OUT"

# --- patch 1: SSTR macro ---------------------------------------------------
grep -rln "define SSTR" "$OUT/src" | while read -r f; do
  sed -i 's|#define SSTR( x ) dynamic_cast< std::ostringstream & >(( std::ostringstream() << std::dec << x ) ).str()|#define SSTR( x ) std::to_string(x)|' "$f"
done

# --- patch 2: dangling map iterator after erase ----------------------------
python3 - "$OUT/src/SimplifyGraph/src/OverlapGraph.cpp" <<'EOF'
import sys
p = sys.argv[1]
src = open(p).read()
old = """		if(it->second->empty())
		{
			delete it->second;
			m_graph->erase(it);
		}
		else
			it++;"""
new = old.replace("m_graph->erase(it);", "it = m_graph->erase(it);")
n = src.count(old)
assert n == 4, f"expected 4 erase loops, found {n}"
open(p, "w").write(src.replace(old, new))
EOF

# --- patch 3: CS2 pr_type buffer overflow ----------------------------------
sed -i 's/pr_type\[3\];/pr_type[4];/' "$OUT/src/SimplifyGraph/src/CS2_stream/parser_cs2.h"

# --- patch 4a: DIMACS dump before CS2 --------------------------------------
python3 - "$OUT/src/SimplifyGraph/src/OverlapGraph.cpp" <<'EOF'
import sys
p = sys.argv[1]
src = open(p).read()
old = """	stringstream oss;
	main_cs2(&ss, oss);"""
new = """	stringstream oss;
	{
		ofstream dmp((outputFilenamePrefix + "_dimacs_dump.txt").c_str());
		dmp << ss.str();
	}
	main_cs2(&ss, oss);"""
assert src.count(old) == 1
open(p, "w").write(src.replace(old, new))
EOF

# --- patch 4b: per-phase graph snapshots -----------------------------------
python3 - "$OUT/src/SimplifyGraph/src/main.cpp" <<'EOF'
import sys
p = sys.argv[1]
src = open(p).read()
pairs = [
  ('Utils::writeCheckPointFile(outputFilenamePrefix,"ParSimplify=1");', 'parsimplify'),
  ('Utils::writeCheckPointFile(outputFilenamePrefix,"InitialSimplify=1");', 'initial'),
  ('Utils::writeCheckPointFile(outputFilenamePrefix,"AggressiveSimplify=1");', 'aggressive'),
  ('Utils::writeCheckPointFile(outputFilenamePrefix,"FlowAnalysis=1");', 'flow'),
  ('Utils::writeCheckPointFile(outputFilenamePrefix,"PostFlowAnalysis=1");', 'postflow'),
  ('Utils::writeCheckPointFile(outputFilenamePrefix,"PrintCtg="+SSTR(ctgCount));', 'printctg'),
  ('Utils::writeCheckPointFile(outputFilenamePrefix,"Scaffold="+SSTR(scfCount));', 'scaffold'),
]
for anchor, name in pairs:
    assert src.count(anchor) == 1, anchor
    snap = ('overlapGraph->printAllEdges(outputFilenamePrefix+"_phase_%s_"'
            '+SSTR(interationCount)+".txt");\n\t\t' % name)
    src = src.replace(anchor, snap + anchor)
open(p, "w").write(src)
EOF

# The Eclipse-generated makefiles mis-resolve the default goal once .d files
# exist; invoke the 'all' target explicitly.
make -C "$OUT/src/BuildGraph/Release" all READGZ=0
make -C "$OUT/src/SimplifyGraph/Release" all READGZ=0
cp "$OUT/src/BuildGraph/Release/buildG" "$OUT/"
cp "$OUT/src/SimplifyGraph/Release/fullsimplify" "$OUT/"
cp "$OUT/src/SimplifyGraph/Release/parsimplify" "$OUT/"
echo "Reference binaries in $OUT: buildG fullsimplify parsimplify"
