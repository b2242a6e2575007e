#!/bin/sh
# Canonical non-test LoC count for VERDICT diagnostics (ADVICE r2:
# record the exact command so the figure reproduces across rounds).
cd "$(dirname "$0")/.." || exit 1
echo "non-test python (dbt_fusion_spark + entry + bench):"
find dbt_fusion_spark -name '*.py' | sort | xargs cat | wc -l
echo "tests:"
find tests -name '*.py' | sort | xargs cat | wc -l
