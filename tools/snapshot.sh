#!/usr/bin/env bash
# End-of-round artifact snapshot: regenerate every builder-owned artifact,
# then commit in ONE motion so `git status` is clean at round end — the
# round-13 and round-14 verdicts both flagged BENCH_FULL.json/LEAKCHECK.json
# drifting modified-uncommitted because generation and the final commit were
# separate manual steps. Run this as the LAST action of a round.
#
# Usage: tools/snapshot.sh [sfDir]   (default /root/testdata/sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.1}

# 1. PLANS.md — dump-set policy: every SparkEntry.queries entry (PlanDump
#    derives the list, so a new query can't be missed the way q263 was).
sbt -batch "runMain graft.PlanDump /root/testdata/sf0.001 PLANS.md"

# 2. The bench capture (writes BENCH_FULL.json in cwd, prints the one-line
#    summary the driver parses).
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" \
  2>&1 | grep '"metric"' || { echo "bench failed" >&2; exit 1; }

# 3. Commit everything in the same motion — including driver-written
#    artifacts (BENCH_r*.json, CORRECTNESS_r*.json, LEAKCHECK.json) that
#    land between rounds and otherwise sit untracked.
git add -A
git commit -m "Round snapshot: regenerated PLANS.md + bench artifacts" \
  || echo "snapshot: nothing to commit"
git status --short
