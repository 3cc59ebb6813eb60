#!/bin/sh
# Build the --py-files artifact for cluster submission:
#   spark-submit --py-files dist/etl_spark.zip \
#       --master <cluster> [--num-executors N] \
#       jobs_replay_entry.py --work-dir ... --parallelism ...
# (etl_spark/jobs/replay.py is the job main; get_spark() inherits the
# cluster master/conf from spark-submit via getOrCreate.)
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/etl_spark.zip
python -c "
import zipfile, os
with zipfile.ZipFile('dist/etl_spark.zip', 'w', zipfile.ZIP_DEFLATED) as z:
    for root, _, files in os.walk('etl_spark'):
        for f in files:
            if f.endswith('.py'):
                p = os.path.join(root, f)
                z.write(p, p)
print('dist/etl_spark.zip written')
"
