#!/bin/bash
# r12 bench-regression attribution: 5-rep BenchOne per >1.2x r10->r11 mover,
# against the r11-built classes, sf0.1. Medians of reps 2-5 approximate the
# full bench's warm-JVM state.
set -u
cd /root/repo
OUT=/tmp/attr_r12.log
: > $OUT
for q in sim_pq_topk dedup_simhash_pairs dedup_semantic_keep sim_bruteforce_topk \
         meter_grid_hourly dedup_clusters decontaminate_bloom decontaminate; do
  java -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
    --add-opens=java.base/java.lang=ALL-UNNAMED \
    --add-opens=java.base/java.nio=ALL-UNNAMED \
    --add-opens=java.base/sun.nio.ch=ALL-UNNAMED \
    --add-opens=java.base/java.util=ALL-UNNAMED \
    --add-opens=java.base/java.lang.invoke=ALL-UNNAMED \
    --add-opens=java.base/java.util.concurrent=ALL-UNNAMED \
    --add-opens=java.base/sun.security.action=ALL-UNNAMED \
    graft.BenchOne "$q" /root/testdata/sf0.1 5 2>/dev/null | grep bench-one >> $OUT
done
echo DONE >> $OUT
