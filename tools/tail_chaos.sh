#!/bin/bash
set -u
cd /tmp/tail20m
rm -rf snap_alpha snap_beta spool txn _kill.log tail1.log tail2.log
mkdir -p stage
mv topic/seg-*.jsonl stage/ 2>/dev/null
[ $(ls stage | wc -l) -eq 10 ] || { echo 'missing segments'; exit 1; }
rm -f topic/_DONE
export PYTHONPATH=/root/repo

python run.py tail > tail1.log 2>&1 &
TAIL_PID=$!
# feed waves; kill -9 mid-run then restart
i=0
for f in $(ls stage); do
  mv "stage/$f" "topic/$f"
  i=$((i+1))
  if [ $i -eq 4 ]; then
    sleep 2   # epoch 4's apply is now in flight (applies take ~4-5s)
    kill -9 $TAIL_PID 2>/dev/null
    echo "KILLED tail after wave 4" >> _kill.log
    sleep 2
    ray stop --force > /dev/null 2>&1   # reap the killed driver's cluster
    sleep 2
    python run.py tail > tail2.log 2>&1 &
    TAIL_PID=$!
  fi
  sleep 6
done
touch topic/_DONE
wait $TAIL_PID
cat _kill.log
grep -h "epoch \|TAIL:" tail1.log tail2.log
