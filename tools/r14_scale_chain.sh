#!/bin/bash
# r14 measurement chain — SERIAL (every job appends SCALE.md and timings
# need an uncontended box). Run with nothing else on the machine.
# vs r13: adds mm_audio_decimate (ADVICE r13 — it was the only r13
# operator with no measured row), the r14 operators
# (mm_text_image_score, dd_exact_nfkc), and the container-source
# read-parallelism arms (src_webdataset / src_tfrecord — verdict ask #6).
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

echo "=== [1/2] 10x/100x arms for the r14 operators (+ the missed mm_audio_decimate row)"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_FACTORS=10,100 \
  SPARK_GRAFT_SCALE_CASES=mm_audio_decimate,mm_text_image_score,dd_exact_nfkc,src_webdataset,src_tfrecord \
  SPARK_GRAFT_SCALE_APPEND=1 "${J[@]}" graft.ScaleCheck 2>&1 | { grep -E "^\[scale\]|wrote" || true; }

echo "=== [2/2] chain done"
