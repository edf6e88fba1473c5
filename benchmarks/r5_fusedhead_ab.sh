#!/bin/sh
# Fused planes head on-chip A/B (README round-5 "Next" item).
# Control + fused arm for each covered family, sequentially (one process at
# a time: the 1-vCPU host and the single tunneled chip both contend).
# Results land in /tmp/fusedhead_ab.json (one bench.py JSON line).
cd /root/repo || exit 1
BENCH_CONFIGS=unet64_512px_bf16_b16,unet64_512px_bf16_b16_nofusedhead,unet64_512px_bf16_b16_dice_bce_mc,unet64_512px_bf16_b16_dice_bce_mc_nofusedhead,multitask_unet64_512px_bf16_b8,multitask_unet64_512px_bf16_b8_nofusedhead \
BENCH_WAIT_S=600 \
python bench.py > /tmp/fusedhead_ab.json 2> /tmp/fusedhead_ab.log
echo "rc=$?" >> /tmp/fusedhead_ab.log
