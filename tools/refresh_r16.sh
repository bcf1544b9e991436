#!/bin/bash
# Round-16 artifact refresh at the 207-query state: five correctness tiers
# + the scoped skew tier (now 8 queries — q187/q192 push a planted hot key
# [user 0 ≈ 30% of events] through the streaming state kernels), artifact
# assembly, ISOLATED local bench, and the three scaling-slope probes.
# Writes per-step logs to /tmp/r16_* and echoes a PHASE line per step. Run
# with nothing else on the machine — sequential sbt invocations only.
set -e
cd /root/repo

SKEW_QUERIES="q34_minhash_pairs q37_trigram_jaccard q47_embed_dedup q102_simhash_neardup q149_sparse_cosine q196_ivf_subsplit_serve q187_stream_sessionization_microbatch q192_stream_exact_dedup_microbatch"

echo "PHASE gen-tiers"
if [ ! -d testdata_xl ]; then
  sbt -batch "runMain graft.GenCorpusXl" > /tmp/r16_genxl.log 2>&1
fi
if [ ! -d testdata_xl2 ]; then
  sbt -batch "runMain graft.GenCorpusXl testdata_xl2 50000 16000" > /tmp/r16_genxl2.log 2>&1
fi
# The full skew gate needs the symlinked base tables plus the three
# GENERATED skewed ones (documents, embeddings, and — new this round —
# events with the hot user key); main() writes all of them.
if [ ! -f testdata_skew/events.parquet ] || [ -L testdata_skew/events.parquet ]; then
  rm -rf testdata_skew
  sbt -batch "runMain graft.GenCorpusSkew" > /tmp/r16_genskew.log 2>&1
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
  > /tmp/r16_skewverify.log 2>&1
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
assert len(qs) == 8, qs
base["queries"] = qs
base["pass"] = len(qs); base["total"] = len(qs)
base["what"] = ("six pair/dedup/serve gates value-checked under hostile distribution "
  "(90% one-language, hot boilerplate 8-gram, planted hot LSH/IVF cluster) plus — new in "
  "round 16 — the two streaming state kernels (q187 sessionization, q192 exact dedup) "
  "driven through REAL micro-batch execution against a generated events table whose "
  "hot key (user 0) carries 30% of the stream")
json.dump(base, open('CORRECTNESS_SKEW.json', 'w'), indent=1)
print("skew artifact refreshed:", len(qs), "queries")
EOF

echo "PHASE artifacts"
python3 tools/artifacts.py xl /tmp/check_testdata_xl.log 25000 10000 \
  CORRECTNESS_XL.json testdata_xl
python3 tools/artifacts.py xl /tmp/check_testdata_xl2.log 50000 16000 \
  CORRECTNESS_XL2.json testdata_xl2
python3 tools/artifacts.py multi 16 \
  "full 207-query oracle gate at FIVE corpus tiers on round-16 code. This state adds q203 (crash-restart of the engine-owned upsert sink: newest commit + manifest deleted and the version dir moved back to staging, replay re-merges from manifested state, hashed against q202's oracle verbatim), q204/q207 (the multimodal decode surface under the per-round gate: formula-derived PNG/QOI images and PCM16/mu-law WAVs synthesized executor-side, decoded through the codec registry, exact feature statistics vs DuckDB computing the same stats from the generator formulas), q205 (incremental IVF centroid refresh: the most-drifted quarter of occupied clusters takes its member fixed-point mean, refreshed centroid arrays compared element-wise against the full SQL re-derivation), and q206 (the spark.sql parser surface over the registered native functions, oracle = q36's verbatim). The upsert sink now resolves reads through a manifest committed last (zero data-tree listing). Every query hash-matches its DuckDB oracle at every tier." \
  CORRECTNESS_MULTI_SF.json \
  sf0.001=/tmp/check_sf0.001.log sf0.01=/tmp/check_sf0.01.log \
  sf0.1=/tmp/check_sf0.1.log testdata_xl=/tmp/check_testdata_xl.log \
  testdata_xl2=/tmp/check_testdata_xl2.log

echo "PHASE bench-local"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r16_bench.log 2>&1
grep -o '{"metric".*' /tmp/r16_bench.log > BENCH_LOCAL_LAST.json
python3 -c "import json; d=json.load(open('BENCH_LOCAL_LAST.json')); print('bench queries:', len(d['queries']), 'regressed:', d.get('regressed'), 'unbaselined:', d.get('unbaselined'))"

echo "PHASE slope sf0.01->sf0.1"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.01 /root/testdata/sf0.1" \
  > /tmp/r16_slope_sf.log 2>&1
grep -o '{"metric".*' /tmp/r16_slope_sf.log > BENCH_SLOPE_r16.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_r16.json')); print('slope sf flagged:', d['flagged'])"

echo "PHASE slope sf0.1->XL"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.1 /root/repo/testdata_xl" \
  > /tmp/r16_slope_xl.log 2>&1
grep -o '{"metric".*' /tmp/r16_slope_xl.log > BENCH_SLOPE_XL.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL.json')); print('slope XL flagged:', d['flagged'])"

echo "PHASE slope XL->XL2"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/repo/testdata_xl /root/repo/testdata_xl2" \
  > /tmp/r16_slope_xl2.log 2>&1
grep -o '{"metric".*' /tmp/r16_slope_xl2.log > BENCH_SLOPE_XL2.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL2.json')); print('slope XL2 flagged:', d['flagged'])"

echo "REFRESH DONE"