#!/bin/bash
# Five-tier correctness sweep: driver sf tiers + engine XL/XL2 tiers.
# Writes per-tier check logs to /tmp/check_<tier>.log for tools/artifacts.py.
set -e
cd /root/repo
if [ ! -d testdata_xl ]; then
  sbt -batch "runMain graft.GenCorpusXl" > /tmp/genxl.log 2>&1
fi
for spec in sf0.001=/root/testdata/sf0.001 sf0.01=/root/testdata/sf0.01 \
            sf0.1=/root/testdata/sf0.1 \
            testdata_xl=/root/repo/testdata_xl \
            testdata_xl2=/root/repo/testdata_xl2; do
  tier="${spec%%=*}"; dir="${spec#*=}"
  python3 tools/check.py "$dir" "/tmp/gv_$tier" > "/tmp/check_$tier.log" 2>&1 \
    || { echo "TIER FAIL $tier"; tail -5 "/tmp/check_$tier.log"; exit 1; }
  tail -1 "/tmp/check_$tier.log"
done
echo SWEEP5 DONE
