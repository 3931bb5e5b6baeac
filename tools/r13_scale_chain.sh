#!/bin/bash
# r13 measurement chain — SERIAL (every job appends SCALE.md and timings
# need an uncontended box). Run with nothing else on the machine.
set -e
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

echo "=== [1/5] store-state arms sf0.1 factor 10"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_STREAM_FACTOR=10 \
  SPARK_GRAFT_STREAM_CASES=store "${J[@]}" graft.StreamScale 2>&1 | grep -E "^SS|appended"

echo "=== [2/5] store-state arms sf0.1 factor 100"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_STREAM_FACTOR=100 \
  SPARK_GRAFT_STREAM_CASES=store "${J[@]}" graft.StreamScale 2>&1 | grep -E "^SS|appended"

echo "=== [3/5] 10x/100x arms for the r13 operators"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_FACTORS=10,100 \
  SPARK_GRAFT_SCALE_CASES=mm_audio_mel,mm_audio_fingerprint,dd_audio_neardup,dd_image_phash_dct,dd_image_neardup_dct \
  SPARK_GRAFT_SCALE_APPEND=1 "${J[@]}" graft.ScaleCheck 2>&1 | grep -E "^\[scale\]|wrote"

echo "=== [4/5] 1000x arms: banded image near-dup (dHash + DCT)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_FACTORS=1000 \
  SPARK_GRAFT_SCALE_CASES=dd_image_neardup \
  SPARK_GRAFT_SCALE_APPEND=1 "${J[@]}" graft.ScaleCheck 2>&1 | grep -E "^\[scale\]|wrote"

echo "=== [5/5] 1000x store-state arms (pp_ingest_media / txt_bm25_streaming)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_STREAM_FACTOR=1000 \
  SPARK_GRAFT_STREAM_CASES=store "${J[@]}" graft.StreamScale 2>&1 | grep -E "^SS|appended"

echo "=== chain done"
