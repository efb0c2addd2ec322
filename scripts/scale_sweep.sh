#!/bin/bash
# sf10 flagship sweep at executor shape (r11 verdict ask #5).
#
# Generates MakeScale rungs if absent (sf1 = x10, sf10 = x100 of the
# sf0.1 fixture, salt mode = distribution-preserving), then runs
# graft.ScaleSweep across both rungs in one multi-JVM session:
# 4 workers x 8 cores, 8 GiB executors (the BASELINE.md skew-validation
# recipe). Requires `sbt package` first; uses spark-submit so it never
# contends with an sbt lock.
set -eu
cd /root/repo
JAR=target/scala-2.13/polars_ds_extensionspark_2.13-0.1.0.jar
SF1="${GRAFT_SF1_DIR:-/root/repo/target/sf1_r12}"
SF10="${GRAFT_SF10_DIR:-/root/repo/target/sf10_r12}"
[ -f "$JAR" ] || { echo "run sbt package first"; exit 1; }

gen() { # gen <dir> <factor>
  [ -d "$1/lineitem.parquet" ] && return 0
  SPARK_GRAFT_CPUS=16 /opt/spark/bin/spark-submit \
    --class graft.MakeScale --driver-memory 16g "$JAR" \
    /root/testdata/sf0.1 "$1" "$2" salt
}
gen "$SF1" 10
gen "$SF10" 100

SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
GRAFT_MASTER='local-cluster[4,8,9216]' GRAFT_EXECUTOR_MEM=8g \
GRAFT_JARS=$(pwd)/$JAR SPARK_GRAFT_CPUS=32 \
/opt/spark/bin/spark-submit --class graft.ScaleSweep \
  --driver-memory 12g "$JAR" "sf1=$SF1" "sf10=$SF10"
