#!/bin/bash
# Full-suite runner. Default: 3 big chunks (the per-module
# jax.clear_caches() fence in tests/conftest.py bounds XLA-CPU compiler
# memory by the largest single module — the old failure mode was a
# SEGFAULT from monotonic compiled-program growth after ~200 tests in one
# process). `--legacy` runs the conservative 10-process split.
set -u
cd "$(dirname "$0")/.."
if [ "${1:-}" = "--legacy" ]; then
  chunks=(
    "tests/test_ba.py tests/test_ba_bucket.py tests/test_ba_pack.py tests/test_fm.py"
    "tests/test_schur.py tests/test_mlschur.py tests/test_keys.py tests/test_geometry.py"
    "tests/test_basis_lpqp.py tests/test_breadth.py tests/test_conditional.py tests/test_constrained_noise.py tests/test_constrained_symbolic.py"
    "tests/test_dataset.py tests/test_diagnostics.py tests/test_native.py tests/test_longtail_factors.py"
    "tests/test_incremental_runner.py tests/test_isam2.py tests/test_manhattan.py tests/test_misc_factors.py"
    "tests/test_navigation.py tests/test_pallas_ops.py tests/test_pose2slam.py tests/test_pose3slam.py"
    "tests/test_shonan_gnc.py tests/test_subgraph_lago.py tests/test_triangulation_smart.py tests/test_unstable.py tests/test_utils_averaging.py"
    "tests/test_dist_schur.py tests/test_parallel.py tests/test_examples.py"
    "tests/test_incremental.py tests/test_discrete_hybrid.py"
    "tests/test_dist_ba.py tests/test_dist_ba_pack.py tests/test_concurrent.py"
  )
else
  chunks=(
    "tests/test_ba.py tests/test_ba_bucket.py tests/test_ba_pack.py tests/test_fm.py tests/test_schur.py tests/test_mlschur.py tests/test_keys.py tests/test_geometry.py tests/test_basis_lpqp.py tests/test_breadth.py tests/test_conditional.py tests/test_constrained_noise.py tests/test_constrained_symbolic.py"
    "tests/test_dataset.py tests/test_diagnostics.py tests/test_native.py tests/test_longtail_factors.py tests/test_incremental_runner.py tests/test_isam2.py tests/test_manhattan.py tests/test_misc_factors.py tests/test_navigation.py tests/test_pallas_ops.py tests/test_pose2slam.py tests/test_pose3slam.py tests/test_shonan_gnc.py tests/test_subgraph_lago.py tests/test_triangulation_smart.py tests/test_unstable.py tests/test_utils_averaging.py"
    "tests/test_dist_schur.py tests/test_parallel.py tests/test_examples.py tests/test_incremental.py tests/test_discrete_hybrid.py tests/test_dist_ba.py tests/test_dist_ba_pack.py tests/test_concurrent.py"
  )
fi
fail=0
for c in "${chunks[@]}"; do
  echo "=== chunk: $c"
  timeout 4800 python -m pytest $c -q || fail=1
done
exit $fail
