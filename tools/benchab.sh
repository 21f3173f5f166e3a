#!/bin/bash
# Interleaved A/B bench vs another git ref's tree (graft.BenchAB).
#
# Usage: tools/benchab.sh <gitref> [namesCsv] [rounds]
#   - builds <gitref> into a git worktree under /tmp/graft_ab_<shortref>
#     (reused if already compiled),
#   - writes target/ab_classes_path so graft.Bench's post-sweep
#     auto-adjudication can also find the tree,
#   - with namesCsv: immediately runs the interleaved A/B on those
#     queries (table on stdout + target/bench_ab.json).
set -e
cd /root/repo
REF="$1"; NAMES="$2"; ROUNDS="${3:-2}"
[ -n "$REF" ] || { echo "usage: tools/benchab.sh <gitref> [namesCsv] [rounds]"; exit 2; }
SHORT=$(git rev-parse --short "$REF")
WT="/tmp/graft_ab_$SHORT"
if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$REF"
fi
if [ ! -d "$WT/target/scala-2.13/classes/graft" ]; then
  (cd "$WT" && sbt -batch compile > /tmp/graft_ab_build_$SHORT.log 2>&1) \
    || { echo "build of $REF failed — see /tmp/graft_ab_build_$SHORT.log"; exit 1; }
fi
mkdir -p target
echo "$WT/target/scala-2.13/classes" > target/ab_classes_path
echo "ab tree ready: $WT (target/ab_classes_path updated)"
if [ -n "$NAMES" ]; then
  exec tools/run.sh BenchAB "$WT/target/scala-2.13/classes" "$NAMES" "$ROUNDS"
fi
