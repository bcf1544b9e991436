#!/bin/bash
# Round-15 SECOND-PASS artifact refresh at the 202-query state: five correctness tiers
# + the scoped skew tier (now 6 queries — q196's sub-split serve joins the
# salting family it completes), artifact assembly, ISOLATED local bench,
# and the three scaling-slope probes. Writes per-step logs to /tmp/r15b_*
# and echoes a PHASE line per step. Run with nothing else on the machine —
# sequential sbt invocations only (the r14 procedure that produced zero
# environmental flags end-to-end).
set -e
cd /root/repo

SKEW_QUERIES="q34_minhash_pairs q37_trigram_jaccard q47_embed_dedup q102_simhash_neardup q149_sparse_cosine q196_ivf_subsplit_serve"

echo "PHASE gen-tiers"
if [ ! -d testdata_xl ]; then
  sbt -batch "runMain graft.GenCorpusXl" > /tmp/r15b_genxl.log 2>&1
fi
if [ ! -d testdata_xl2 ]; then
  sbt -batch "runMain graft.GenCorpusXl testdata_xl2 50000 16000" > /tmp/r15b_genxl2.log 2>&1
fi
# The full skew gate needs the symlinked base tables, not just the two
# skewed ones SkewTierSpec arms — main() writes both.
if [ ! -L testdata_skew/lineitem.parquet ]; then
  sbt -batch "runMain graft.GenCorpusSkew" > /tmp/r15b_genskew.log 2>&1
fi

for spec in sf0.001=/root/testdata/sf0.001 \
            sf0.01=/root/testdata/sf0.01 \
            sf0.1=/root/testdata/sf0.1 \
            testdata_xl=/root/repo/testdata_xl \
            testdata_xl2=/root/repo/testdata_xl2; do
  tier="${spec%%=*}"; dir="${spec#*=}"
  echo "PHASE check $tier"
  python3 tools/check.py "$dir" "/tmp/gvb_$tier" > "/tmp/checkb_$tier.log" 2>&1 \
    || { echo "TIER FAIL $tier"; tail -5 "/tmp/checkb_$tier.log"; exit 1; }
  tail -1 "/tmp/checkb_$tier.log"
done

echo "PHASE check skew"
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify testdata_skew /tmp/gvb_skew $(echo $SKEW_QUERIES | tr ' ' ',')" \
  > /tmp/r15b_skewverify.log 2>&1
python3 tools/check.py testdata_skew /tmp/gvb_skew --skip-verify $SKEW_QUERIES \
  > /tmp/checkb_skew.log 2>&1 \
  || { echo "TIER FAIL skew"; tail -5 /tmp/checkb_skew.log; exit 1; }
tail -1 /tmp/checkb_skew.log
python3 - <<'EOF'
import json, re
base = json.load(open('CORRECTNESS_SKEW.json'))
qs = {}
for line in open('/tmp/checkb_skew.log'):
    m = re.match(r'ok\s+(\S+): (.*)', line)
    if m: qs[m.group(1)] = {"status": "ok", "detail": m.group(2)}
assert len(qs) == 6, qs
base["queries"] = qs
base["pass"] = len(qs); base["total"] = len(qs)
json.dump(base, open('CORRECTNESS_SKEW.json', 'w'), indent=1)
print("skew artifact refreshed:", len(qs), "queries")
EOF

echo "PHASE artifacts"
python3 tools/artifacts.py xl /tmp/checkb_testdata_xl.log 25000 10000 \
  CORRECTNESS_XL.json testdata_xl
python3 tools/artifacts.py xl /tmp/checkb_testdata_xl2.log 50000 16000 \
  CORRECTNESS_XL2.json testdata_xl2
python3 tools/artifacts.py multi 15 \
  "full 202-query oracle gate at FIVE corpus tiers on round-15 second-pass code. On top of the 197-query state (q192-q197), this adds q198 (checkpoint-recovery for the streaming exact-dedup kernel: stopped after 4 of 8 slices, newest commit-log entry deleted to force a replay, restarted — oracle is q53's SQL verbatim), q199 (stream-static broadcast enrichment join through the real micro-batch + parquet-sink harness), q200 (watermarked STREAM-STREAM interval join — join state buffered per side, evicted by watermark — oracle is q57's SQL verbatim), q201 (CDC MERGE: latest-op-wins change-log apply to a base table via one max_by aggregation + one key join), and q202 (streaming UPSERT sink: foreachBatch into a bucketed versioned serving table, touched-buckets-only rewrites, tombstone retention, batchId-keyed exactly-once). Every query hash-matches its DuckDB oracle at every tier." \
  CORRECTNESS_MULTI_SF.json \
  sf0.001=/tmp/checkb_sf0.001.log sf0.01=/tmp/checkb_sf0.01.log \
  sf0.1=/tmp/checkb_sf0.1.log testdata_xl=/tmp/checkb_testdata_xl.log \
  testdata_xl2=/tmp/checkb_testdata_xl2.log

echo "PHASE bench-local"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r15b_bench.log 2>&1
grep -o '{"metric".*' /tmp/r15b_bench.log > BENCH_LOCAL_LAST.json
python3 -c "import json; d=json.load(open('BENCH_LOCAL_LAST.json')); print('bench queries:', len(d['queries']), 'regressed:', d.get('regressed'), 'unbaselined:', d.get('unbaselined'))"

echo "PHASE slope sf0.01->sf0.1"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.01 /root/testdata/sf0.1" \
  > /tmp/r15b_slope_sf.log 2>&1
grep -o '{"metric".*' /tmp/r15b_slope_sf.log > BENCH_SLOPE_r15.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_r15.json')); print('slope sf flagged:', d['flagged'])"

echo "PHASE slope sf0.1->XL"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.1 /root/repo/testdata_xl" \
  > /tmp/r15b_slope_xl.log 2>&1
grep -o '{"metric".*' /tmp/r15b_slope_xl.log > BENCH_SLOPE_XL.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL.json')); print('slope XL flagged:', d['flagged'])"

echo "PHASE slope XL->XL2"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/repo/testdata_xl /root/repo/testdata_xl2" \
  > /tmp/r15b_slope_xl2.log 2>&1
grep -o '{"metric".*' /tmp/r15b_slope_xl2.log > BENCH_SLOPE_XL2.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL2.json')); print('slope XL2 flagged:', d['flagged'])"

echo "REFRESH DONE"
