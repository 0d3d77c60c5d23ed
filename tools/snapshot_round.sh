#!/bin/sh
# Round close-out: stamp and commit the driver-generated artifacts
# (BENCH_rNN / CORRECTNESS_rNN / BENCH_local* / LEAKCHECK / COPYCHECK)
# so `git status` is clean at adjudication time. The builder runs this
# at exit; the DRIVER can (and should) invoke it again after any
# post-exit bench/correctness regeneration — it is idempotent and
# commits nothing when the tree is already clean.
#
#     sh tools/snapshot_round.sh [extra files...]
set -e
cd "$(dirname "$0")/.."
python3 tools/stamp_artifacts.py LEAKCHECK.json
FILES=$(git status --porcelain -- 'BENCH_*.json' 'CORRECTNESS_*.json' \
  'BENCH_local*' 'LEAKCHECK.json' 'COPYCHECK.json' "$@" \
  | awk '{print $NF}')
if [ -z "$FILES" ]; then
  echo "snapshot_round: nothing to commit"
  exit 0
fi
git add $FILES
git commit -m "Snapshot round artifacts (bench/correctness/leakcheck)"
echo "snapshot_round: committed $(echo "$FILES" | wc -l) artifact file(s)"
