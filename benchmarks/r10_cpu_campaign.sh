#!/bin/bash
# r10 CPU quality campaign — serialized (1 vCPU host, CLAUDE.md):
#  1. bf16 12-seed rerun + per-epoch curves   (VERDICT r4 item 1a)
#  2. topo pipelined / coarse / TopoCount arms (items 3, 4, 7)
#  3. CLTR bf16 at 6 seeds                     (item 1b)
# Each stage writes its JSON incrementally; order = evidence value.
set -x
cd "$(dirname "$0")/.."
python benchmarks/r10_bf16_diag.py --seeds 12 \
  > /tmp/r10_bf16.log 2>&1
python benchmarks/parity_suite.py \
  --experiments topo_pipelined,topo_coarse,topocount --seeds 6 \
  > /tmp/r10_topo_arms.log 2>&1
python benchmarks/parity_cltr_detect.py --seeds 6 --bf16 --no-torch \
  --out benchmarks/PARITY_CLTR_BF16.json \
  > /tmp/r10_cltr_bf16.log 2>&1
echo CAMPAIGN_DONE
