#!/bin/bash
# r19 measurement chain — SERIAL (appends SCALE.md; timings need an
# uncontended box). 10x/100x arms for the r19 optimization ring
# (VERDICT r18 #8): the pre-sorted inter_size verify (dd_ngram_jaccard),
# the per-row MinHash signatures (dd_minhash), the components loop +
# probe (dd_cc_pipeline), the graph loop sizing (g_pagerank, g_lpa), and
# the tagged single-scan DSIR (pp_dsir).
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

for c in dd_ngram_jaccard dd_minhash dd_cc_pipeline g_pagerank g_lpa pp_dsir; do
  echo "=== 10x/100x arms: $c"
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_FACTORS=10,100 \
    SPARK_GRAFT_SCALE_CASES=$c \
    SPARK_GRAFT_SCALE_APPEND=1 "${J[@]}" graft.ScaleCheck 2>&1 | { grep -E "^\[scale\]|wrote" || true; }
done
echo "=== chain done"
