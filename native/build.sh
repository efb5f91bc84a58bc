#!/bin/sh
# Build the native components into native/lib/.
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -march=native -shared -fPIC -std=c++17 reward/reward.cc -o lib/libreward.so
g++ -O3 -march=native -shared -fPIC -std=c++17 tokenizer/tokenizer.cc -o lib/libtokenizer.so
echo "built native/lib/libreward.so + libtokenizer.so"
