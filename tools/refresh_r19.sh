#!/bin/bash
# Round-19 artifact refresh at the 214-query state. New this round, per the
# r18 verdict: (1) the skew tier grows to 13 queries — q202/q203 drive the
# streaming upsert sink + its crash-restart twin through the skew corpus
# whose hot stream key (user 0, ~30% of the stream) is the worst case for
# the per-batch max_by compaction and touched-bucket rewrite; (2) Bench and
# BenchSlope now take the machine-wide /tmp/graft_bench.lock and stamp
# other_graft_jvms into their artifacts (RunCoord), so a concurrent driver
# bench SERIALIZES against this refresh's timed phases instead of
# contaminating them; (3) the cosmetic sbt-summary grep no longer aborts
# the refresh under set -e when the phrasing changes (r18's refresh died
# mid-run — this script must survive to the end). Then the five
# correctness tiers, artifact assembly, ISOLATED local bench, and the
# three scaling-slope probes. Writes per-step logs to /tmp/r19_* and
# echoes a PHASE line per step. Keep the machine otherwise idle —
# sequential sbt invocations only; the bench lock protects the timed
# phases but not the check tiers.
set -e
cd /root/repo

SKEW_QUERIES="q34_minhash_pairs q37_trigram_jaccard q47_embed_dedup q102_simhash_neardup q149_sparse_cosine q196_ivf_subsplit_serve q209_pipeline_curation q210_ivf_refreshed_serve q187_stream_sessionization_microbatch q192_stream_exact_dedup_microbatch q200_stream_stream_join q202_stream_upsert_sink q203_stream_upsert_restart"

echo "PHASE sbt-test"
sbt -batch test > /tmp/r19_sbttest.log 2>&1 \
  || { echo "SUITE FAIL"; grep -E "\*\*\* FAILED|Tests: " /tmp/r19_sbttest.log | tail -10; exit 1; }
grep -E "Tests: succeeded" /tmp/r19_sbttest.log | tail -1 || true

echo "PHASE gen-tiers"
if [ ! -d testdata_xl ]; then
  sbt -batch "runMain graft.GenCorpusXl" > /tmp/r19_genxl.log 2>&1
fi
if [ ! -d testdata_xl2 ]; then
  sbt -batch "runMain graft.GenCorpusXl testdata_xl2 50000 16000" > /tmp/r19_genxl2.log 2>&1
fi
if [ ! -f testdata_skew/events.parquet ] || [ -L testdata_skew/events.parquet ]; then
  rm -rf testdata_skew
  sbt -batch "runMain graft.GenCorpusSkew" > /tmp/r19_genskew.log 2>&1
fi

for spec in sf0.001=/root/testdata/sf0.001 \
            sf0.01=/root/testdata/sf0.01 \
            sf0.1=/root/testdata/sf0.1 \
            testdata_xl=/root/repo/testdata_xl \
            testdata_xl2=/root/repo/testdata_xl2; do
  tier="${spec%%=*}"; dir="${spec#*=}"
  echo "PHASE check $tier"
  python3 tools/check.py "$dir" "/tmp/gv_$tier" > "/tmp/check_$tier.log" 2>&1 \
    || { echo "TIER FAIL $tier"; tail -5 "/tmp/check_$tier.log"; exit 1; }
  tail -1 "/tmp/check_$tier.log"
done

echo "PHASE check skew"
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify testdata_skew /tmp/gv_skew $(echo $SKEW_QUERIES | tr ' ' ',')" \
  > /tmp/r19_skewverify.log 2>&1
python3 tools/check.py testdata_skew /tmp/gv_skew --skip-verify $SKEW_QUERIES \
  > /tmp/check_skew.log 2>&1 \
  || { echo "TIER FAIL skew"; tail -5 /tmp/check_skew.log; exit 1; }
tail -1 /tmp/check_skew.log
python3 - <<'EOF'
import json, re
base = json.load(open('CORRECTNESS_SKEW.json'))
qs = {}
for line in open('/tmp/check_skew.log'):
    m = re.match(r'ok\s+(\S+): (.*)', line)
    if m: qs[m.group(1)] = {"status": "ok", "detail": m.group(2)}
assert len(qs) == 13, qs
base["queries"] = qs
base["pass"] = len(qs); base["total"] = len(qs)
base["round"] = 19
base["what"] = ("six pair/dedup/serve gates value-checked under hostile distribution "
  "(90% one-language, hot boilerplate 8-gram, planted hot LSH/IVF cluster), the three "
  "streaming state kernels driven through REAL micro-batch execution against a generated "
  "events table whose hot key (user 0) carries 30% of the stream, the two composed paths "
  "(q209 five-stage curation pipeline, q210 refresh-then-serve IVF loop), and (new in "
  "round 19) the streaming upsert sink pair: q202 — per-batch max_by compaction and "
  "touched-bucket rewrite where the hot key concentrates ~30% of every batch into one "
  "bucket — and q203 — the same sink through a mid-stream crash + checkpoint restart, "
  "exactly-once contract hash-checked against the batch CDC oracle verbatim")
json.dump(base, open('CORRECTNESS_SKEW.json', 'w'), indent=1)
print("skew artifact refreshed:", len(qs), "queries")
EOF

echo "PHASE artifacts"
python3 tools/artifacts.py xl /tmp/check_testdata_xl.log 25000 10000 \
  CORRECTNESS_XL.json testdata_xl
python3 tools/artifacts.py xl /tmp/check_testdata_xl2.log 50000 16000 \
  CORRECTNESS_XL2.json testdata_xl2
python3 tools/artifacts.py multi 19 \
  "full 214-query oracle gate at FIVE corpus tiers on round-19 code. This state closes the round-18 verdict: q156's RFM quintiles and q185's ABC running shares no longer plan global windows over linear-cardinality aggregates (operators/GlobalRank: range-partition + in-partition ordinal + broadcast prefix-sum offsets, ntile remainder arithmetic bit-matching the window it replaced), a global-window plan lint in PlanGuardSpec now machine-enforces the constant-bounded sanction across all 214 plans at two sfs (pattern-pinned whitelist, the q156 class can no longer sit unnoticed), JPEG decode is hand-rolled (multimodal/Jpeg.scala: marker walk, Huffman + dequant + exact-cosine IDCT, restart markers, chroma upsample, YCbCr-to-RGB; progressive/arithmetic profiles reject to the stub; JpegSpec pins 0-LSB IDCT parity and a +/-1 LSB flat-field match vs the JDK decoder) letting q214's envelope tighten from +/-0.02 to the measured +/-0.014 mean / 0.005 std, and Bench/BenchSlope serialize on a machine-wide lock while stamping other_graft_jvms so the r18 refresh/bench contention class is machine-visible. Every query hash-matches its DuckDB oracle at every tier; sbt test gates this refresh." \
  CORRECTNESS_MULTI_SF.json \
  sf0.001=/tmp/check_sf0.001.log sf0.01=/tmp/check_sf0.01.log \
  sf0.1=/tmp/check_sf0.1.log testdata_xl=/tmp/check_testdata_xl.log \
  testdata_xl2=/tmp/check_testdata_xl2.log

echo "PHASE bench-local"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r19_bench.log 2>&1
# head -1: Bench prints the full artifact first, then a <2 KB compact
# line for bounded-tail consumers (the round driver) — keep the full one.
grep -o '{"metric".*' /tmp/r19_bench.log | head -1 > BENCH_LOCAL_LAST.json
python3 -c "import json; d=json.load(open('BENCH_LOCAL_LAST.json')); print('bench queries:', len(d['queries']), 'era:', d.get('era'), 'era_warn:', d.get('era_warn'), 'other_jvms:', d.get('other_graft_jvms'), 'lock_wait_s:', d.get('lock_wait_s'), 'regressed:', d.get('regressed'), 'unbaselined:', d.get('unbaselined'))"

echo "PHASE slope sf0.01->sf0.1"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.01 /root/testdata/sf0.1" \
  > /tmp/r19_slope_sf.log 2>&1
grep -o '{"metric".*' /tmp/r19_slope_sf.log > BENCH_SLOPE_r19.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_r19.json')); print('slope sf flagged:', d['flagged'])"

echo "PHASE slope sf0.1->XL"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.1 /root/repo/testdata_xl" \
  > /tmp/r19_slope_xl.log 2>&1
grep -o '{"metric".*' /tmp/r19_slope_xl.log > BENCH_SLOPE_XL.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL.json')); print('slope XL flagged:', d['flagged'])"

echo "PHASE slope XL->XL2"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/repo/testdata_xl /root/repo/testdata_xl2" \
  > /tmp/r19_slope_xl2.log 2>&1
grep -o '{"metric".*' /tmp/r19_slope_xl2.log > BENCH_SLOPE_XL2.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL2.json')); print('slope XL2 flagged:', d['flagged'])"

echo "REFRESH DONE"
