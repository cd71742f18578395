#!/bin/bash
# Serial perf session on the real chip (single-tenant TPU tunnel —
# never run two of these at once).  Results append to /tmp/perf_session.log.
set -u
cd /root/repo
LOG=/tmp/perf_session.log
run() {
  echo "=== $* ===" >> $LOG
  timeout 2400 "$@" 2>&1 | grep -v -i warning >> $LOG
  echo >> $LOG
}
run python bench.py --num_proposals 128
run python bench.py
run python bench.py --clip_len 12
run python bench.py --clip_len 20
run env BD_H=384 BD_W=512 python experiments/head_breakdown.py
run env BD_H=384 BD_W=512 BD_PROPS=96 python experiments/head_breakdown.py
run env BD_SRC_H=480 BD_SRC_W=640 BD_H=384 BD_W=512 python experiments/pipeline_breakdown.py
echo DONE >> $LOG
