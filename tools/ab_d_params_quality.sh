#!/bin/bash
# Endpoint quality pair for d_params routing (VERDICT r4 #4 follow-on):
# identical 300+100-epoch x8 GAN trainings with f32 vs bf16 storage for the
# large discriminator weights, evaluated on the held-out synthetic
# validation split. GAN trajectories diverge at the chaos floor (DESIGN.md;
# the d_params neutrality trajectories in docs/evidence_r5/ab_d_params.log
# match for the first epochs then separate), so trajectory equality is not
# provable; the routing criterion is endpoint quality parity (val PSNR/SSIM
# same regime), the same protocol that routed d_moments in round 4.
set -x
export JAX_COMPILATION_CACHE_DIR=.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
OUT=/tmp/dparams_quality
mkdir -p $OUT/f32 $OUT/bf16

for M in f32 bf16; do
  echo "=== train d_params=$M ==="
  time env TPUSR_D_PARAMS=$M python -m tpusr.cli.train_gan \
    --data_dir /tmp/synth_x16 --out_dir $OUT/$M --num_images 8 \
    --pre_train_epochs 300 --fine_tune_epochs 100 --train_log_freq 100 \
    --dtype bfloat16 || echo "train $M FAILED rc=$?"
  G=$(ls -t $OUT/$M/trained/GANx8/*/fine_tuned_srgan_G.pth 2>/dev/null | head -1)
  echo "=== eval d_params=$M (checkpoint: $G) ==="
  time python -m tpusr.cli.eval_gan --data_dir /tmp/synth_x16 \
    --out_dir $OUT/$M --model_path "$G" --dtype bfloat16 \
    || echo "eval $M FAILED rc=$?"
done
echo "=== DONE ==="
