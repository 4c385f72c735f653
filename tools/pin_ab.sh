#!/bin/bash
# A/B the pair-pin (spark.graft.mining.pinPairParts) at a given sf dir
# over the nine pairParts consumers that regressed in BENCH_sf1 r13.
# Usage: tools/pin_ab.sh [sfDir] — STRICTLY SERIAL with other JVMs.
set -eu
cd "$(dirname "$0")/.."
SF=${1:-target/sfdata/sf1}
Q="d03_ngram_jaccard d04_minhash_lsh d05_simhash d07_dup_components \
d11_threshold_curve d13_semantic_clusters g01_pagerank g02_triangles \
g06_hits g07_source_modularity g08_kcore"
export SPARK_GRAFT_EXPLAIN_REPS=${SPARK_GRAFT_EXPLAIN_REPS:-3}
echo "== pin ON (default) =="
tools/jrun.sh graft.Explain "$SF" $Q 2>/dev/null | grep -E '^== '
echo "== pin OFF =="
SPARK_GRAFT_JAVA_OPTS="-Dspark.graft.mining.pinPairParts=false" \
  tools/jrun.sh graft.Explain "$SF" $Q 2>/dev/null | grep -E '^== '
