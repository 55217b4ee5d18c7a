#!/usr/bin/env bash
# Pre-commit gate: refuse to snapshot a repo that does not compile.
#
# Round 4 shipped its snapshot with a one-line type-inference break and
# scored zero despite 182 green tests on the working tree. This script is
# the guard: run it before EVERY snapshot commit (and ideally before any
# commit touching src/).
#
#   tools/precommit.sh          # compile main + test sources (~30 s warm)
#   tools/precommit.sh --test   # also run the full scalatest suite
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch compile Test/compile

if [[ "${1:-}" == "--test" ]]; then
  sbt -batch test
fi

echo "precommit: OK"
