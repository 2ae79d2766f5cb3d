#!/usr/bin/env bash
# Localhost Spark standalone cluster for scripts/standalone_scaling.py:
# 1 master + 4 workers (8 cores / 12g each), every daemon FOREGROUND in
# its own tmux window ("sparkcluster" session). Foreground-in-tmux
# instead of sbin/start-*.sh because this sandbox reaps daemonized
# (setsid/nohup) processes when the launching shell exits.
#
#   scripts/standalone_cluster.sh up      # start master + 4 workers
#   scripts/standalone_cluster.sh down    # kill the tmux session
#   scripts/standalone_cluster.sh status  # alive check (master + workers)
set -euo pipefail

SESSION=sparkcluster
SPARK_HOME="${SPARK_HOME:-$(python -c 'import pyspark, os; print(os.path.dirname(pyspark.__file__))')}"
MASTER_URL=spark://127.0.0.1:7077
N_WORKERS="${SPARK_GRAFT_WORKERS:-4}"
WORKER_CORES="${SPARK_GRAFT_WORKER_CORES:-8}"
WORKER_MEM="${SPARK_GRAFT_WORKER_MEM:-12g}"

up() {
  # NOTE: executor local dirs (shuffle/spill) intentionally stay on
  # DISK (worker default /tmp) — SPARK_LOCAL_DIRS=/dev/shm put shuffle
  # in tmpfs ON TOP of the tmpfs table workdir + 4x8g heaps and the
  # kernel OOM-killed executors mid-round (exit 137) at the 4M-pop
  # round size; the r3 protocol also ran executor shuffle on disk.
  tmux new-session -d -s "$SESSION" -n master
  tmux send-keys -t "$SESSION:master" \
    "SPARK_NO_DAEMONIZE=1 '$SPARK_HOME/bin/spark-class' org.apache.spark.deploy.master.Master --host 127.0.0.1 --port 7077 --webui-port 8089" Enter
  sleep 3
  for i in $(seq 1 "$N_WORKERS"); do
    # Pin each worker (and so its executors, python workers, GC/netty
    # threads — availableProcessors follows the affinity mask) to a
    # DISJOINT core set: worker i = cores [(i-1)*C, i*C). This is the
    # faithful one-box analogue of N separate 8-core nodes — unpinned,
    # the 1-executor leg borrows all 32 cores' GC/cache/bus and the
    # measured N→4N efficiency understates the engine.
    lo=$(( (i - 1) * WORKER_CORES )); hi=$(( i * WORKER_CORES - 1 ))
    tmux new-window -t "$SESSION" -n "worker$i"
    tmux send-keys -t "$SESSION:worker$i" \
      "SPARK_NO_DAEMONIZE=1 SPARK_WORKER_DIR=/tmp/spark-worker$i taskset -c $lo-$hi '$SPARK_HOME/bin/spark-class' org.apache.spark.deploy.worker.Worker '$MASTER_URL' --cores $WORKER_CORES --memory $WORKER_MEM --port $((40000 + i)) --webui-port $((8090 + i)) --work-dir /tmp/spark-worker$i" Enter
  done
  echo "cluster starting: master $MASTER_URL + $N_WORKERS workers (${WORKER_CORES}c/${WORKER_MEM} each) in tmux session '$SESSION'"
}

down() {
  tmux kill-session -t "$SESSION" 2>/dev/null || true
  pkill -f org.apache.spark.deploy.worker.Worker 2>/dev/null || true
  pkill -f org.apache.spark.deploy.master.Master 2>/dev/null || true
  echo "cluster stopped"
}

status() {
  pgrep -af org.apache.spark.deploy.master.Master || echo "no master"
  pgrep -fc org.apache.spark.deploy.worker.Worker || echo "no workers"
}

case "${1:-}" in
  up) up ;;
  down) down ;;
  status) status ;;
  *) echo "usage: $0 up|down|status" >&2; exit 2 ;;
esac
