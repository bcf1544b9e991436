#!/bin/bash
# Round-13 artifact refresh at the 189-query state: remaining four
# correctness tiers (sf0.01 log already produced by the gate run), then
# artifact assembly, then local bench + the three scaling-slope probes.
# Writes per-step logs to /tmp/r13_*.log; echoes a PHASE line per step.
set -e
cd /root/repo

echo "PHASE gen-xl"
if [ ! -d testdata_xl ]; then
  sbt -batch "runMain graft.GenCorpusXl" > /tmp/r13_genxl.log 2>&1
fi
# The check loop and the XL->XL2 slope probe below consume testdata_xl2
# unconditionally — mirror the guard so a clean machine regenerates it.
if [ ! -d testdata_xl2 ]; then
  sbt -batch "runMain graft.GenCorpusXl testdata_xl2 50000 16000" > /tmp/r13_genxl2.log 2>&1
fi

for spec in sf0.001=/root/testdata/sf0.001 \
            sf0.1=/root/testdata/sf0.1 \
            testdata_xl=/root/repo/testdata_xl \
            testdata_xl2=/root/repo/testdata_xl2; do
  tier="${spec%%=*}"; dir="${spec#*=}"
  echo "PHASE check $tier"
  python3 tools/check.py "$dir" "/tmp/gv_$tier" > "/tmp/check_$tier.log" 2>&1 \
    || { echo "TIER FAIL $tier"; tail -5 "/tmp/check_$tier.log"; exit 1; }
  tail -1 "/tmp/check_$tier.log"
done

echo "PHASE artifacts"
python3 tools/artifacts.py xl /tmp/check_testdata_xl.log 25000 10000 \
  CORRECTNESS_XL.json testdata_xl
python3 tools/artifacts.py xl /tmp/check_testdata_xl2.log 50000 16000 \
  CORRECTNESS_XL2.json testdata_xl2
python3 tools/artifacts.py multi 13 \
  "full 189-query oracle gate at FIVE corpus tiers on round-13 code. This state adds q186/q187 (REAL micro-batch streaming gates: writeStream + watermark advance over a file-source stream, hashed against the batch twins' oracles), q188 (incremental IVF assignment against the standing centroid table, gated as identical to the one-pass index) and q189 (SemDeDup: cluster-scoped semantic dedup over the memoized IVF coarse quantizer, keeper = farthest-from-centroid per arXiv:2303.09540). Every query hash-matches its DuckDB oracle at every tier." \
  CORRECTNESS_MULTI_SF.json \
  sf0.001=/tmp/check_sf0.001.log sf0.01=/tmp/check_sf0.01.log \
  sf0.1=/tmp/check_sf0.1.log testdata_xl=/tmp/check_testdata_xl.log \
  testdata_xl2=/tmp/check_testdata_xl2.log

echo "PHASE bench-local"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r13_bench.log 2>&1
grep -o '{"metric".*' /tmp/r13_bench.log > BENCH_LOCAL_LAST.json
python3 -c "import json; d=json.load(open('BENCH_LOCAL_LAST.json')); print('bench queries:', len(d['queries']), 'regressed:', d.get('regressed'))"

echo "PHASE slope sf0.01->sf0.1"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.01 /root/testdata/sf0.1" \
  > /tmp/r13_slope_sf.log 2>&1
grep -o '{"metric".*' /tmp/r13_slope_sf.log > BENCH_SLOPE_r13.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_r13.json')); print('slope sf flagged:', d['flagged'])"

echo "PHASE slope sf0.1->XL"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.1 /root/repo/testdata_xl" \
  > /tmp/r13_slope_xl.log 2>&1
grep -o '{"metric".*' /tmp/r13_slope_xl.log > BENCH_SLOPE_XL.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL.json')); print('slope XL flagged:', d['flagged'])"

echo "PHASE slope XL->XL2"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/repo/testdata_xl /root/repo/testdata_xl2" \
  > /tmp/r13_slope_xl2.log 2>&1
grep -o '{"metric".*' /tmp/r13_slope_xl2.log > BENCH_SLOPE_XL2.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL2.json')); print('slope XL2 flagged:', d['flagged'])"

echo "REFRESH DONE"
