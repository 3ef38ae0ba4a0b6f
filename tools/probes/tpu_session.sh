#!/bin/sh
# One-shot TPU measurement session: runs every pending probe/bench serially
# (the axon tunnel serializes TPU processes) and logs everything.
set -x
cd /root/repo
L=/tmp/tpu_results
mkdir -p $L

timeout 2400 python tools/probes/lab_chain_bisect.py   > $L/bisect3.log 2>&1
timeout 2400 python tools/probes/lab_opaque_probe.py   > $L/bisect4.log 2>&1
timeout 5400 python tools/bench_lab_impls.py --iters 30 \
                                      > $L/lab_impls.log 2>&1
timeout 2400 python bench.py          > $L/bench_bs8.log 2>&1
timeout 2400 python bench.py --bs 16  > $L/bench_bs16.log 2>&1
echo DONE > $L/done
