#!/bin/sh
# Package stakgraph_spark/ for spark-submit --py-files.
# Produces dist/stakgraph_spark.zip with the package at the zip root
# (Spark prepends the zip itself to sys.path on driver and executors).
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/stakgraph_spark.zip
# -x excludes caches; the zip must contain only source the executors need.
zip -qr dist/stakgraph_spark.zip stakgraph_spark -x '*__pycache__*' -x '*.pyc'
ls -l dist/stakgraph_spark.zip
