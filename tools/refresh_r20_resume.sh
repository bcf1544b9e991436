#!/bin/bash
# Resume of tools/refresh_r20.sh from the skew phase: the first run's five
# correctness tiers + sbt test all passed (214/214 each; logs /tmp/check_*),
# but the skew phase failed because SkewTierSpec's beforeAll had armed a
# MINIMAL testdata_skew (documents/embeddings/events, no relational
# symlinks) during the sbt-test phase, so the gen guard skipped
# GenCorpusSkew and check.py could not find region.parquet. This script
# regenerates the tier with GenCorpusSkew (which also symlinks the
# relational tables from sf0.1) and runs the remaining phases verbatim.
set -e
cd /root/repo

SKEW_QUERIES="q34_minhash_pairs q37_trigram_jaccard q47_embed_dedup q102_simhash_neardup q149_sparse_cosine q196_ivf_subsplit_serve q209_pipeline_curation q210_ivf_refreshed_serve q187_stream_sessionization_microbatch q192_stream_exact_dedup_microbatch q200_stream_stream_join q202_stream_upsert_sink q203_stream_upsert_restart"

echo "PHASE gen-skew"
rm -rf testdata_skew
sbt -batch "runMain graft.GenCorpusSkew" > /tmp/r20_genskew.log 2>&1
tail -1 /tmp/r20_genskew.log || true

echo "PHASE check skew"
SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify testdata_skew /tmp/gv_skew $(echo $SKEW_QUERIES | tr ' ' ',')" \
  > /tmp/r20_skewverify.log 2>&1
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
base["round"] = 20
base["what"] = ("six pair/dedup/serve gates value-checked under hostile distribution "
  "(90% one-language, hot boilerplate 8-gram, planted hot LSH/IVF cluster), the three "
  "streaming state kernels driven through REAL micro-batch execution against a generated "
  "events table whose hot key (user 0) carries 30% of the stream, the two composed paths "
  "(q209 five-stage curation pipeline, q210 refresh-then-serve IVF loop), and the "
  "streaming upsert sink pair (q202 per-batch max_by compaction + touched-bucket rewrite, "
  "q203 the same sink through a mid-stream crash + checkpoint restart) — on round-20 code, "
  "i.e. through the java.nio checkpoint-file manager and fork-free local FileSystem the "
  "optimization round shipped, so the exactly-once and state-recovery contracts are "
  "re-proven on the faster I/O path, not assumed from round 19")
json.dump(base, open('CORRECTNESS_SKEW.json', 'w'), indent=1)
print("skew artifact refreshed:", len(qs), "queries")
EOF

echo "PHASE artifacts"
python3 tools/artifacts.py xl /tmp/check_testdata_xl.log 25000 10000 \
  CORRECTNESS_XL.json testdata_xl
python3 tools/artifacts.py xl /tmp/check_testdata_xl2.log 50000 16000 \
  CORRECTNESS_XL2.json testdata_xl2
python3 tools/artifacts.py multi 20 \
  "full 214-query oracle gate at FIVE corpus tiers on round-20 (optimization round 2) code. The round's changes are runtime-layer, which is exactly what this refresh re-proves end-to-end: streaming checkpoint I/O goes through graft.streaming.NioCheckpointFileManager (java.nio atomic write-temp-then-rename; Hadoop's shell-forked chmod/readlink per checkpoint file was the measured per-trigger floor) and local file creates go through graft.hadoop.FastLocalFileSystem (stock checksummed LocalFileSystem minus the forked chmod per created file), so every stateful gate, both crash-restart gates and the upsert sink's engine-owned exactly-once run their recovery contracts on the new I/O path at every tier; q132 derives c1 via a w1-window over an eagerly pinned bigram-type relation (corpus scans 8 to 3) and q209 pins the narrow survivor relation between its census and packing stages (corpus scans 15 to ~6), both hash-matching their DuckDB oracles at every tier; Bench additionally emits a full per-query final stdout line and a per-core-count artifact copy so the driver's per-query comparison works again. Every query hash-matches its DuckDB oracle at every tier; sbt test gates this refresh." \
  CORRECTNESS_MULTI_SF.json \
  sf0.001=/tmp/check_sf0.001.log sf0.01=/tmp/check_sf0.01.log \
  sf0.1=/tmp/check_sf0.1.log testdata_xl=/tmp/check_testdata_xl.log \
  testdata_xl2=/tmp/check_testdata_xl2.log

echo "PHASE bench-local"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r20_bench.log 2>&1
grep -o '{"metric".*' /tmp/r20_bench.log | head -1 > BENCH_LOCAL_LAST.json
python3 -c "import json; d=json.load(open('BENCH_LOCAL_LAST.json')); print('bench queries:', len(d['queries']), 'total:', round(d['value'],1), 'era:', d.get('era'), 'era_warn:', d.get('era_warn'), 'other_jvms:', d.get('other_graft_jvms'), 'lock_wait_s:', d.get('lock_wait_s'), 'regressed:', d.get('regressed'), 'unbaselined:', d.get('unbaselined'))"

echo "PHASE slope sf0.01->sf0.1"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.01 /root/testdata/sf0.1" \
  > /tmp/r20_slope_sf.log 2>&1
grep -o '{"metric".*' /tmp/r20_slope_sf.log > BENCH_SLOPE_r20.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_r20.json')); print('slope sf flagged:', d['flagged'])"

echo "PHASE slope sf0.1->XL"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.1 /root/repo/testdata_xl" \
  > /tmp/r20_slope_xl.log 2>&1
grep -o '{"metric".*' /tmp/r20_slope_xl.log > BENCH_SLOPE_XL.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL.json')); print('slope XL flagged:', d['flagged'])"

echo "PHASE slope XL->XL2"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/repo/testdata_xl /root/repo/testdata_xl2" \
  > /tmp/r20_slope_xl2.log 2>&1
grep -o '{"metric".*' /tmp/r20_slope_xl2.log > BENCH_SLOPE_XL2.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL2.json')); print('slope XL2 flagged:', d['flagged'])"

echo "REFRESH DONE"
