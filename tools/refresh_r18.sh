#!/bin/bash
# Round-18 artifact refresh at the 214-query state. New this round, per the
# r17 verdict: (1) THE TEST SUITE IS PART OF THE GATE — `sbt test` runs
# first and a red suite fails the refresh (r17 shipped a committed-red
# GifSpec because nothing ran it); (2) the skew tier grows to 11 queries —
# q209 pushes the composed curation pipeline's dedup prefix-keys and census
# quotas through the 90%-hot-language corpus, q210 routes the refreshed-
# centroid 2-probe serve across the planted hot cluster. Then the five
# correctness tiers, artifact assembly, ISOLATED local bench, and the three
# scaling-slope probes. Writes per-step logs to /tmp/r18_* and echoes a
# PHASE line per step. Run with nothing else on the machine — sequential
# sbt invocations only.
set -e
cd /root/repo

SKEW_QUERIES="q34_minhash_pairs q37_trigram_jaccard q47_embed_dedup q102_simhash_neardup q149_sparse_cosine q196_ivf_subsplit_serve q209_pipeline_curation q210_ivf_refreshed_serve q187_stream_sessionization_microbatch q192_stream_exact_dedup_microbatch q200_stream_stream_join"

echo "PHASE sbt-test"
sbt -batch test > /tmp/r18_sbttest.log 2>&1 \
  || { echo "SUITE FAIL"; grep -E "\*\*\* FAILED|Tests: " /tmp/r18_sbttest.log | tail -10; exit 1; }
grep -E "Tests: succeeded" /tmp/r18_sbttest.log | tail -1

echo "PHASE gen-tiers"
if [ ! -d testdata_xl ]; then
  sbt -batch "runMain graft.GenCorpusXl" > /tmp/r18_genxl.log 2>&1
fi
if [ ! -d testdata_xl2 ]; then
  sbt -batch "runMain graft.GenCorpusXl testdata_xl2 50000 16000" > /tmp/r18_genxl2.log 2>&1
fi
if [ ! -f testdata_skew/events.parquet ] || [ -L testdata_skew/events.parquet ]; then
  rm -rf testdata_skew
  sbt -batch "runMain graft.GenCorpusSkew" > /tmp/r18_genskew.log 2>&1
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
  > /tmp/r18_skewverify.log 2>&1
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
assert len(qs) == 11, qs
base["queries"] = qs
base["pass"] = len(qs); base["total"] = len(qs)
base["what"] = ("six pair/dedup/serve gates value-checked under hostile distribution "
  "(90% one-language, hot boilerplate 8-gram, planted hot LSH/IVF cluster), the three "
  "streaming state kernels driven through REAL micro-batch execution against a generated "
  "events table whose hot key (user 0) carries 30% of the stream, and (new in round 18) "
  "the two composed paths: q209 — the five-stage curation pipeline's dedup prefix-keys, "
  "decontamination semi-join, and per-language census quotas under the 90%-hot language — "
  "and q210 — the refresh-then-serve IVF loop's 2-probe routing across the planted hot "
  "cluster")
json.dump(base, open('CORRECTNESS_SKEW.json', 'w'), indent=1)
print("skew artifact refreshed:", len(qs), "queries")
EOF

echo "PHASE artifacts"
python3 tools/artifacts.py xl /tmp/check_testdata_xl.log 25000 10000 \
  CORRECTNESS_XL.json testdata_xl
python3 tools/artifacts.py xl /tmp/check_testdata_xl2.log 50000 16000 \
  CORRECTNESS_XL2.json testdata_xl2
python3 tools/artifacts.py multi 18 \
  "full 214-query oracle gate at FIVE corpus tiers on round-18 code. This state replaces the JDK GIF reader with a hand-rolled LZW + interlace decoder (the JDK reader silently zeroes the last interlace pass-4 row at heights 2-4 — the r17 verdict's top finding; both the q213 feature path and frameSample's disposal-aware compositing now decode the wire format directly, and GifSpec pins an interlaced height-2-4 case), adds q214 (JPEG decode envelope: the one lossy codec, gated on its deterministic components — header geometry, aspect, and formula-derived channel-mean bounds as booleans), hardens the upsert sink (a checkpoint reset over kept state now fails fast instead of silently swallowing batches as replays; refused directory fsyncs warn once), scopes every on-disk stream dir by JVM pid so concurrent graft processes cannot collide, and adds the era-drift alarm (era_warn/era_raw in the bench artifact, notes-entry enforcement in BaselineNotesSpec). Every query hash-matches its DuckDB oracle at every tier, and sbt test is now a gating step of this refresh." \
  CORRECTNESS_MULTI_SF.json \
  sf0.001=/tmp/check_sf0.001.log sf0.01=/tmp/check_sf0.01.log \
  sf0.1=/tmp/check_sf0.1.log testdata_xl=/tmp/check_testdata_xl.log \
  testdata_xl2=/tmp/check_testdata_xl2.log

echo "PHASE bench-local"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r18_bench.log 2>&1
# head -1: Bench now prints the full artifact first, then a <2 KB compact
# line for bounded-tail consumers (the round driver) — keep the full one.
grep -o '{"metric".*' /tmp/r18_bench.log | head -1 > BENCH_LOCAL_LAST.json
python3 -c "import json; d=json.load(open('BENCH_LOCAL_LAST.json')); print('bench queries:', len(d['queries']), 'era:', d.get('era'), 'era_warn:', d.get('era_warn'), 'regressed:', d.get('regressed'), 'unbaselined:', d.get('unbaselined'))"

echo "PHASE slope sf0.01->sf0.1"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.01 /root/testdata/sf0.1" \
  > /tmp/r18_slope_sf.log 2>&1
grep -o '{"metric".*' /tmp/r18_slope_sf.log > BENCH_SLOPE_r18.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_r18.json')); print('slope sf flagged:', d['flagged'])"

echo "PHASE slope sf0.1->XL"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.1 /root/repo/testdata_xl" \
  > /tmp/r18_slope_xl.log 2>&1
grep -o '{"metric".*' /tmp/r18_slope_xl.log > BENCH_SLOPE_XL.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL.json')); print('slope XL flagged:', d['flagged'])"

echo "PHASE slope XL->XL2"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/repo/testdata_xl /root/repo/testdata_xl2" \
  > /tmp/r18_slope_xl2.log 2>&1
grep -o '{"metric".*' /tmp/r18_slope_xl2.log > BENCH_SLOPE_XL2.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL2.json')); print('slope XL2 flagged:', d['flagged'])"

echo "REFRESH DONE"
