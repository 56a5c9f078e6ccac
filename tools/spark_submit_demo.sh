#!/usr/bin/env bash
# End-to-end `spark-submit` demonstration (the north rule's invocation
# surface): package the library jar, write the golden fixture in .o5m,
# convert it via `spark-submit --class graft.oma.OmaCli` at two cluster
# sizes (local[8] / local[32] — the sandbox stand-in for N vs 4N
# executors), and assert the outputs are byte-identical across sizes.
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch package > /dev/null
sbt -batch "runMain graft.oma.FixtureFiles /tmp/graft_submit_demo" > /dev/null

JAR=target/scala-2.13/omaspark_2.13-0.1.0.jar
for CORES in 8 32; do
  t0=$(date +%s.%N)
  /opt/spark/bin/spark-submit --master "local[$CORES]" --driver-memory 8g \
    --class graft.oma.OmaCli "$JAR" -p all \
    /tmp/graft_submit_demo/fixture.o5m /tmp/graft_submit_demo/out_$CORES.oma \
    2>/dev/null
  t1=$(date +%s.%N)
  echo "spark-submit local[$CORES]: $(awk "BEGIN{printf \"%.1f\", $t1 - $t0}")s," \
    "output $(stat -c%s /tmp/graft_submit_demo/out_$CORES.oma) bytes"
done

cmp /tmp/graft_submit_demo/out_8.oma /tmp/graft_submit_demo/out_32.oma \
  && echo "OK: outputs byte-identical across cluster sizes"
