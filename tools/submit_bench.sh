#!/usr/bin/env bash
# spark-submit deployment path (north_rule: "run via spark-submit --py-files
# on a multi-executor cluster"). Packages the engine as a zip and submits the
# bench to a multi-executor master — local-cluster[N,C,MEM] in this sandbox
# (real separate executor JVMs); swap --master for yarn/k8s on a real cluster.
#
# Usage: tools/submit_bench.sh [master] [n_urls]
#
# Note: after the JSON result line prints, local-cluster teardown can log a
# harmless "Master removed our application" race inside spark.stop() — the
# bench itself has already completed.
set -euo pipefail
cd "$(dirname "$0")/.."

MASTER="${1:-local-cluster[4,2,6144]}"
N_URLS="${2:-10000000}"

rm -f /tmp/crawlspark.zip
python - <<'PY'
import zipfile, os
with zipfile.ZipFile("/tmp/crawlspark.zip", "w") as z:
    for root, _, files in os.walk("crawlspark"):
        for f in files:
            if f.endswith(".py"):
                p = os.path.join(root, f)
                z.write(p, p)
print("packaged /tmp/crawlspark.zip")
PY

SPARK_SUBMIT="$(python -c 'import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit"))')"

"$SPARK_SUBMIT" \
  --master "$MASTER" \
  --conf spark.executor.memory=5632m \
  --conf spark.driver.memory=8g \
  --conf spark.sql.session.timeZone=UTC \
  --py-files /tmp/crawlspark.zip \
  bench.py --frontier-only "$N_URLS" --runs 1 --master "$MASTER"
