#!/bin/bash
# Stronger endpoint-quality pair for the d_moments routing decision.
#
# The first pair (tools/ab_d_moments_quality.sh) ran the DEFAULT config,
# where the fixed-detach + weight-1.0 adversarial sum is known to collapse
# (round-2 A/B/D triangle: ~10 dB val) — both arms collapsed, so it only
# shows "same regime" in the collapse sense. This pair uses
# --adv_weight 1e-3 (SRGAN paper eq. 3), the config where the D meaningfully
# shapes G while fidelity is preserved (round 2: ~25.6 dB val), so a
# D-moment-dtype effect on G quality would actually show up in PSNR/SSIM.
set -x
export JAX_COMPILATION_CACHE_DIR=.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
OUT=/tmp/dmom_quality2
mkdir -p $OUT/f32 $OUT/bf16

for M in f32 bf16; do
  echo "=== train d_moments=$M (adv_weight 1e-3) ==="
  time env TPUSR_D_MOMENTS=$M python -m tpusr.cli.train_gan \
    --data_dir /tmp/synth_x16 --out_dir $OUT/$M --num_images 8 \
    --pre_train_epochs 300 --fine_tune_epochs 100 --train_log_freq 100 \
    --adv_weight 1e-3 --dtype bfloat16 || echo "train $M FAILED rc=$?"
  G=$(ls -t $OUT/$M/trained/GANx8/*/fine_tuned_srgan_G.pth 2>/dev/null | head -1)
  echo "=== eval d_moments=$M (checkpoint: $G) ==="
  time python -m tpusr.cli.eval_gan --data_dir /tmp/synth_x16 \
    --out_dir $OUT/$M --model_path "$G" --dtype bfloat16 \
    || echo "eval $M FAILED rc=$?"
done

echo "=== held-out eval results ==="
for M in f32 bf16; do
  echo "--- d_moments=$M ---"
  cat $OUT/$M/out/GANx8/*/*_log.txt
done
echo "=== DONE ==="
