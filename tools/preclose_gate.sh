#!/bin/bash
# Standing pre-close gate (r9 verdict task 7): run before every round close.
#
#  1. full oracle gate at sf0.01 (graft.Verify + dtype-strict check.py)
#  2. cross-partitioning determinism sweep at sf0.001 AND sf0.01
#  3. the same sweep over the collision-enriched argmax/ranking subset at
#     the 100x replica (SPARK_GRAFT_100X_DIR, default /tmp/sf100x), where
#     duplicate keys are dense enough to surface arrival-order argmax ties
#     (the q_changelog_apply class) and any split-prefix-scan drift
#
# Each stage appends to tools/preclose_gate.log with a timestamp; the gate
# FAILS (non-zero) if any stage does. Run serially - stages share local[32].
set -u
cd "$(dirname "$0")/.."
LOG=tools/preclose_gate.log
# the log is append-only across invocations; remember where THIS run
# starts so the committed summary contains only this run's stage lines
LOG_START=$( [ -f "$LOG" ] && wc -l < "$LOG" || echo 0 )
HUNDREDX="${SPARK_GRAFT_100X_DIR:-/tmp/sf100x}"
# the ranking/argmax faces where key collisions decide survivors
SUBSET="q_changelog_apply,q_global_rank,q_skyline,q_max_concurrency,q_dedup_keep_best,q_sample_topk_group,q_top_customers,q_mode_user,q_scd2_customers,q_co_order_topk,q15_top_supplier,q10_returned_items,q_hybrid_rrf,q_hybrid_rrf_batch"
fail=0

stamp() { date -u '+%Y-%m-%dT%H:%M:%SZ'; }
run_stage() {  # name, command...
  local name="$1"; shift
  echo "[$(stamp)] START $name" | tee -a "$LOG"
  if "$@" >> "$LOG" 2>&1; then
    echo "[$(stamp)] PASS  $name" | tee -a "$LOG"
  else
    echo "[$(stamp)] FAIL  $name" | tee -a "$LOG"; fail=1
  fi
}

rm -rf /tmp/verify_preclose
run_stage "verify sf0.01" \
  sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_preclose"
run_stage "oracle gate sf0.01 (dtype-strict)" \
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_preclose
run_stage "determinism sweep sf0.001" \
  sbt -batch "runMain graft.tools.DeterminismSweep /root/testdata/sf0.001"
run_stage "determinism sweep sf0.01" \
  sbt -batch "runMain graft.tools.DeterminismSweep /root/testdata/sf0.01"
if [ -d "$HUNDREDX" ]; then
  SPARK_GRAFT_ONLY="$SUBSET" run_stage "determinism sweep 100x subset" \
    env SPARK_GRAFT_ONLY="$SUBSET" \
    sbt -batch "runMain graft.tools.DeterminismSweep $HUNDREDX"
else
  echo "[$(stamp)] SKIP  determinism sweep 100x subset ($HUNDREDX missing)" | tee -a "$LOG"
fi
echo "[$(stamp)] preclose gate exit=$fail" | tee -a "$LOG"
# the raw log is gitignored (r13 ADVICE: 7 MB/round of history bloat); the
# COMMITTED artifact is this stage-status summary — every PASS/FAIL/SKIP
# line plus the exit status, from THIS invocation only (r14 review: a
# whole-log grep mixed stale lines from prior runs under the new exit)
tail -n +$((LOG_START + 1)) "$LOG" \
  | grep -E '^\[[0-9TZ:-]+\] (PASS|FAIL|SKIP|preclose gate exit)' \
  > tools/preclose_gate_summary.txt
exit $fail
