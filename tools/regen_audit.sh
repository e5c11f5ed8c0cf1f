#!/bin/bash
# Regeneration-robustness audit, one command (see PERF.md "Round 5"):
# perturb a testdata SF (planted borderline near-dups + reshuffled rows +
# appended embeddings), regenerate the reference goldens for it, run the
# full Verify + DuckDB gate. Expected: 0 fail. Any red row here is an
# oracle calibrated to one generator draw — fix the operator/oracle, not
# the data.
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${1:-/root/testdata/sf0.01}
WORK=${2:-/tmp/graft_perturbed}
GOLD=src/test/resources/golden

python3 tools/perturb_testdata.py "$SF" "$WORK"
python3 tools/make_chunk_fixtures.py "$WORK" graft_perturbed
python3 tools/make_bpe_fixture.py "$WORK" 10 \
  "$GOLD/bpe_merges_graft_perturbed.parquet" \
  "$GOLD/bpe_encode_graft_perturbed.parquet"
sbt -batch "runMain graft.Verify $WORK $WORK/verify_out"
python3 tools/check.py "$WORK" "$WORK/verify_out"
# throwaway goldens: derived from the CURRENT testdata generation, never
# committed (regenerate per audit run)
rm -f "$GOLD"/*graft_perturbed*.parquet
