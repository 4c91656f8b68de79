#!/usr/bin/env bash
# Single source of truth for the README's suite/test counts (the r16
# verdict's README-drift task): recompute from the tree and rewrite
# the two marked README lines in place. Run after adding a suite or a
# test; CountsSpec fails `sbt test` if README and tree ever diverge.
#
# Counting rules, validated against sbt's own scalatest summary
# ("Suites: completed N" / "Total number of tests run: M"):
#  - a scalatest SUITE is a `class X extends AnyFunSuite|SparkSpecBase`
#    declaration (SmootherSpec.scala holds two classes — file counts
#    would under-report);
#  - a scalatest TEST is a non-comment `test(` opener (ScalaCheck
#    `Properties` objects — MinKSpec, ExpressionProps — register
#    `property(...)=` checks under the scalacheck framework, which
#    scalatest's summary does NOT include).
set -euo pipefail
cd "$(dirname "$0")/.."

suites=$(grep -rhcE '^[[:space:]]*class [A-Za-z0-9]+ extends (AnyFunSuite|SparkSpecBase)' \
  src/test/scala/graft/*.scala | python3 -c 'import sys; print(sum(int(x) for x in sys.stdin))')
tests=$(grep -rhE '^[[:space:]]*test\(' src/test/scala/graft/*.scala | wc -l | tr -d ' ')

sed -i -E "s|[0-9]+ suites / [0-9]+ scalatest tests|${suites} suites / ${tests} scalatest tests|" README.md
sed -i -E "s|# [0-9]+ suites, [0-9]+ tests|# ${suites} suites, ${tests} tests|" README.md

echo "suites=${suites} tests=${tests} (README.md rewritten)"
