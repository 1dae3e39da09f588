#!/bin/sh
# Package the engine for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
zip -qr engine.zip deepcrawl4ai_spark -x '*__pycache__*'
echo "wrote $(pwd)/engine.zip"
