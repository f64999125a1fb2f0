#!/usr/bin/env bash
# Full test suite, split across a few pytest processes.
#
# One monolithic process accumulates hundreds of XLA:CPU compiles and has
# intermittently segfaulted inside backend_compile_and_load on this VM
# (see conftest.py's codegen flag for the other half of the mitigation).
# Chunking bounds per-process compile count and makes a crash attributable.
set -u
cd "$(dirname "$0")/.."

chunks=(
  "tests/test_adjacency.py tests/test_gcn.py tests/test_losses.py tests/test_metrics.py tests/test_data.py tests/test_native_packer.py tests/test_fusion.py"
  "tests/test_rnn.py tests/test_relation_attention.py tests/test_relation_net.py tests/test_gated_attention.py tests/test_baselines.py tests/test_pallas_gcnii.py tests/test_pallas_gcnii_train.py tests/test_pallas_rnn.py"
  "tests/test_dialogue_gnn.py tests/test_all_graph_types_train.py tests/test_daily.py tests/test_daily_trainer.py tests/test_frontends.py tests/test_raw_input.py"
  "tests/test_e2e_torch_parity.py tests/test_train_parity.py tests/test_reference_oracle.py tests/test_attention_oracle.py tests/test_import_torch_checkpoint.py"
  "tests/test_trainer.py tests/test_cli.py tests/test_vmap_sweep.py tests/test_graph_parallel.py tests/test_resume_serve.py tests/test_streaming.py tests/test_profiling.py"
  "tests/test_mesh_production.py tests/test_learning.py tests/test_drop_override.py"
)

# guard: every tests/test_*.py must appear in a chunk, or a new test file
# would silently never run under this (the canonical) suite entry point
missing=0
for f in tests/test_*.py; do
  case " ${chunks[*]} " in
    *" $f "*) ;;
    *) echo "ERROR: $f is not in any run_suite.sh chunk" >&2; missing=1 ;;
  esac
done
[ "$missing" -ne 0 ] && exit 2

rc=0
for c in "${chunks[@]}"; do
  echo "=== chunk: $c"
  JAX_PLATFORMS=cpu python -m pytest $c -q "$@" || rc=$?
done
exit $rc
