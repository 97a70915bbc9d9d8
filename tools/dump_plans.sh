#!/bin/sh
# Regenerate PLANS.md: formatted physical plans of the headline queries.
# Usage: tools/dump_plans.sh   (after sbt compile)
exec /opt/spark/bin/spark-shell --master "local[8]" \
  --conf spark.sql.shuffle.partitions=8 --conf spark.ui.enabled=false \
  --conf spark.driver.extraClassPath=target/scala-2.13/classes \
  -i tools/dump_plans.scala
