#!/bin/bash
# Three-point scale probe (VERDICT r11 #2): heavy tier at sf0.1 / sf1 / sf3
# on local-cluster (real inter-JVM shuffle), two fresh-JVM passes per leg,
# min-of-two fed to tools/exponents3.py. sf1/sf3 are tools.ScaleUp outputs
# (10x / 30x replicas of the driver's sf0.1 corpus, see ScaleUp scaladoc).
set -euo pipefail
cd /root/repo
# local-cluster workers launch executor JVMs via the Spark launcher's
# command builder: it needs SPARK_HOME, and SPARK_SCALA_VERSION short-
# circuits its scala-dir probe (which otherwise dies with "Cannot find
# any build directories" under an sbt-launched driver)
export SPARK_HOME=/opt/spark
export SPARK_SCALA_VERSION=2.13
OUT=${1:-/tmp/scale_r12}
mkdir -p "$OUT"
JAR=$(ls target/scala-2.13/*.jar | head -1)
SUBSET="bm25_index_search bm25_index_forget bm25_mlt bm25_mlt_batch cdc_index_forget \
dedup_cc_keepers dedup_cc_star dedup_closure \
dedup_minhash dedup_ngram pipeline_full sim_ivf_topk sim_ivfpq_topk \
sim_pq_adc sim_pqindex_rescored sim_pqindex_topk"
for leg in "sf0.1:/root/testdata/sf0.1" "sf1:/root/repo/data/sf1" "sf3:/root/repo/data/sf3"; do
  name="${leg%%:*}"; dir="${leg#*:}"
  for p in 1 2; do
    echo "=== $name pass $p ==="
    SPARK_GRAFT_SF_DIR="$dir" \
    SPARK_GRAFT_MASTER="local-cluster[2,8,14336]" \
    SPARK_GRAFT_EXEC_MEM=12g \
    SPARK_GRAFT_JARS="$JAR" \
    SPARK_GRAFT_CPUS=16 \
    SPARK_GRAFT_NO_RERUN=1 \
    SPARK_GRAFT_BENCH_OUT="$OUT/${name}_p${p}.json" \
    sbt -batch "runMain graft.Bench $SUBSET" > "$OUT/${name}_p${p}.log" 2>&1
    tail -1 "$OUT/${name}_p${p}.log"
  done
done
python3 tools/exponents3.py \
  "$OUT/sf0.1_p1.json" "$OUT/sf0.1_p2.json" \
  "$OUT/sf1_p1.json" "$OUT/sf1_p2.json" \
  "$OUT/sf3_p1.json" "$OUT/sf3_p2.json" | tee "$OUT/exponents3.md"
