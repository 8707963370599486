#!/usr/bin/env bash
# TSAN + ASAN/UBSAN runs of the first-party native runtime (csrc/) under the
# threaded stress driver (csrc/stress_native.cpp). The reference has no
# first-party native code to sanitize (SURVEY.md §5.2); this rebuild's packers
# and WordPiece encoder are threaded C++, so they get both sanitizers:
#   - ThreadSanitizer: internal pools x concurrent callers on a shared
#     Graph/Vocab handle;
#   - AddressSanitizer (+UBSAN, leak check on): buffer bounds on every packer
#     layout, handle lifetime.
# MEDTOK_PACK_THREADS=8 forces the pools even on 1-core boxes.
# Usage: scripts/sanitize_native.sh   (exit 0 = both clean)
set -euo pipefail
cd "$(dirname "$0")/.."

SRC="csrc/medtok_graph.cpp csrc/wordpiece.cpp csrc/stress_native.cpp"
OUT=$(mktemp -d)
trap 'rm -rf "$OUT"' EXIT

echo "== ThreadSanitizer =="
g++ -std=c++17 -O1 -g -fsanitize=thread -fno-omit-frame-pointer \
    $SRC -o "$OUT/stress_tsan" -lpthread
MEDTOK_PACK_THREADS=8 TSAN_OPTIONS="halt_on_error=1" "$OUT/stress_tsan"
echo "TSAN: clean"

echo "== AddressSanitizer + UBSan =="
g++ -std=c++17 -O1 -g -fsanitize=address,undefined -fno-omit-frame-pointer \
    $SRC -o "$OUT/stress_asan" -lpthread
MEDTOK_PACK_THREADS=8 ASAN_OPTIONS="detect_leaks=1:halt_on_error=1" \
    UBSAN_OPTIONS="halt_on_error=1" "$OUT/stress_asan"
echo "ASAN/UBSAN: clean"

echo "sanitize_native: ALL CLEAN"
