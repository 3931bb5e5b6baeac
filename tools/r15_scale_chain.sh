#!/bin/bash
# r15 measurement chain — SERIAL (every job appends SCALE.md and timings
# need an uncontended box). Run with nothing else on the machine.
# vs r14: adds the banded-Hamming skew stress (verdict ask #7), the
# pp_ingest content-hash store growth rows (ask #5), the bounded-vs-
# unbounded streaming-dedup state arms (ask #6's state story, hdfs +
# rocksdb), and 10x/100x arms for the r15 operators
# (s_tfexample_media's shard chain rides src_tfexample_media).
set -e -o pipefail
cd /root/repo
J=(java
  --add-opens=java.base/java.lang=ALL-UNNAMED
  --add-opens=java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens=java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens=java.base/java.io=ALL-UNNAMED
  --add-opens=java.base/java.net=ALL-UNNAMED
  --add-opens=java.base/java.nio=ALL-UNNAMED
  --add-opens=java.base/java.util=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens=java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens=java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens=java.base/sun.security.action=ALL-UNNAMED
  --add-opens=java.base/sun.util.calendar=ALL-UNNAMED
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx16g -Xss32m
  -cp "target/scala-2.13/classes:/opt/spark/jars/*")

echo "=== [1/3] banded-Hamming skew stress (planted monoculture, 10x/100x)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_FACTORS= \
  SPARK_GRAFT_SCALE_CASES=skew_banded SPARK_GRAFT_SKEW_FACTORS=10,100 \
  SPARK_GRAFT_SCALE_APPEND=1 "${J[@]}" graft.ScaleCheck 2>&1 | { grep -E "^\[scale\]|wrote" || true; }

echo "=== [2/3] streaming dedup state arms + ingest content-hash store (factor 100)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_STREAM_FACTOR=100 \
  SPARK_GRAFT_STREAM_ONLY=dedup_unbounded,dedup_wm_disjoint,pp_ingest \
  "${J[@]}" graft.StreamScale 2>&1 | { grep -E "^SS |appended" || true; }

echo "=== [3/3] 10x/100x arms for the r15 tf.Example media shard chain"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_FACTORS=10,100 \
  SPARK_GRAFT_SCALE_CASES=src_tfexample_media \
  SPARK_GRAFT_SCALE_APPEND=1 "${J[@]}" graft.ScaleCheck 2>&1 | { grep -E "^\[scale\]|wrote" || true; }

echo "=== chain done"
