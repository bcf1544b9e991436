#!/bin/bash
# Round-17 artifact refresh at the 213-query state: five correctness tiers
# + the scoped skew tier (now 9 queries — q200 pushes the planted hot key
# [user 0 ≈ 30% of events] through the stream-stream join's per-side state
# buffers), artifact assembly, ISOLATED local bench, and the three
# scaling-slope probes. Writes per-step logs to /tmp/r17_* and echoes a
# PHASE line per step. Run with nothing else on the machine — sequential
# sbt invocations only.
set -e
cd /root/repo

SKEW_QUERIES="q34_minhash_pairs q37_trigram_jaccard q47_embed_dedup q102_simhash_neardup q149_sparse_cosine q196_ivf_subsplit_serve q187_stream_sessionization_microbatch q192_stream_exact_dedup_microbatch q200_stream_stream_join"

echo "PHASE gen-tiers"
if [ ! -d testdata_xl ]; then
  sbt -batch "runMain graft.GenCorpusXl" > /tmp/r17_genxl.log 2>&1
fi
if [ ! -d testdata_xl2 ]; then
  sbt -batch "runMain graft.GenCorpusXl testdata_xl2 50000 16000" > /tmp/r17_genxl2.log 2>&1
fi
if [ ! -f testdata_skew/events.parquet ] || [ -L testdata_skew/events.parquet ]; then
  rm -rf testdata_skew
  sbt -batch "runMain graft.GenCorpusSkew" > /tmp/r17_genskew.log 2>&1
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
  > /tmp/r17_skewverify.log 2>&1
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
assert len(qs) == 9, qs
base["queries"] = qs
base["pass"] = len(qs); base["total"] = len(qs)
base["what"] = ("six pair/dedup/serve gates value-checked under hostile distribution "
  "(90% one-language, hot boilerplate 8-gram, planted hot LSH/IVF cluster) plus the three "
  "streaming state kernels — q187 sessionization, q192 exact dedup, and (new in round 17) "
  "q200 stream-stream join with its per-side state buffers — driven through REAL micro-batch "
  "execution against a generated events table whose hot key (user 0) carries 30% of the stream")
json.dump(base, open('CORRECTNESS_SKEW.json', 'w'), indent=1)
print("skew artifact refreshed:", len(qs), "queries")
EOF

echo "PHASE artifacts"
python3 tools/artifacts.py xl /tmp/check_testdata_xl.log 25000 10000 \
  CORRECTNESS_XL.json testdata_xl
python3 tools/artifacts.py xl /tmp/check_testdata_xl2.log 50000 16000 \
  CORRECTNESS_XL2.json testdata_xl2
python3 tools/artifacts.py multi 17 \
  "full 213-query oracle gate at FIVE corpus tiers on round-17 code. This state adds q208 (BMP decode: BI_RGB 24-bpp and the BI_RLE8 compressed path with all four escape families, formula pixels/palette synthesized executor-side, oracle recomputes the stats from the formulas), q211 (IMA- and MS-ADPCM decode: both integer predictor state machines replayed sample-by-sample in a recursive CTE oracle), q212 (uncompressed-AVI frame decode: the RIFF hdrl/strl/movi walk, bottom-up DIB frames, the 16-frame sampling cap, duration arithmetic, channel means gated through a bit-exact float fold), q213 (multi-frame GIF decode through the JDK LZW reader with a formula palette), q209 (the composed five-stage curation pipeline — exact dedup, quality cascade, decontamination, survivor-census mixture balancing, sequence packing — as ONE gated query whose oracle chains the member oracles' verbatim fragments), and q210 (the q44 2-probe IVF search served through q205's refreshed centroid table — the refresh-serve loop closed under the hash gate). The upsert sink additionally hardened: replay of an already-manifested batch is a no-op, the manifest write fsyncs, torn manifests fall back. Every query hash-matches its DuckDB oracle at every tier." \
  CORRECTNESS_MULTI_SF.json \
  sf0.001=/tmp/check_sf0.001.log sf0.01=/tmp/check_sf0.01.log \
  sf0.1=/tmp/check_sf0.1.log testdata_xl=/tmp/check_testdata_xl.log \
  testdata_xl2=/tmp/check_testdata_xl2.log

echo "PHASE bench-local"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  sbt -batch "runMain graft.Bench" > /tmp/r17_bench.log 2>&1
grep -o '{"metric".*' /tmp/r17_bench.log > BENCH_LOCAL_LAST.json
python3 -c "import json; d=json.load(open('BENCH_LOCAL_LAST.json')); print('bench queries:', len(d['queries']), 'era:', d.get('era'), 'regressed:', d.get('regressed'), 'unbaselined:', d.get('unbaselined'))"

echo "PHASE slope sf0.01->sf0.1"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.01 /root/testdata/sf0.1" \
  > /tmp/r17_slope_sf.log 2>&1
grep -o '{"metric".*' /tmp/r17_slope_sf.log > BENCH_SLOPE_r17.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_r17.json')); print('slope sf flagged:', d['flagged'])"

echo "PHASE slope sf0.1->XL"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/testdata/sf0.1 /root/repo/testdata_xl" \
  > /tmp/r17_slope_xl.log 2>&1
grep -o '{"metric".*' /tmp/r17_slope_xl.log > BENCH_SLOPE_XL.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL.json')); print('slope XL flagged:', d['flagged'])"

echo "PHASE slope XL->XL2"
SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.BenchSlope /root/repo/testdata_xl /root/repo/testdata_xl2" \
  > /tmp/r17_slope_xl2.log 2>&1
grep -o '{"metric".*' /tmp/r17_slope_xl2.log > BENCH_SLOPE_XL2.json
python3 -c "import json; d=json.load(open('BENCH_SLOPE_XL2.json')); print('slope XL2 flagged:', d['flagged'])"

echo "REFRESH DONE"
