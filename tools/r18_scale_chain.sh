#!/bin/bash
# r18 measurement chain — SERIAL (appends SCALE.md; timings need an
# uncontended box). Adds 10x/100x arms for the r18 ring (VERDICT r17
# #5): the DAU/WAU dedup aggregation and the chained-min funnel.
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

echo "=== [1/2] 10x/100x arms: q_dau_wau"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_FACTORS=10,100 \
  SPARK_GRAFT_SCALE_CASES=q_dau_wau \
  SPARK_GRAFT_SCALE_APPEND=1 "${J[@]}" graft.ScaleCheck 2>&1 | { grep -E "^\[scale\]|wrote" || true; }

echo "=== [2/2] 10x/100x arms: q_funnel_steps"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_FACTORS=10,100 \
  SPARK_GRAFT_SCALE_CASES=q_funnel_steps \
  SPARK_GRAFT_SCALE_APPEND=1 "${J[@]}" graft.ScaleCheck 2>&1 | { grep -E "^\[scale\]|wrote" || true; }

echo "=== chain done"
