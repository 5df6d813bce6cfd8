#!/bin/bash
# x16 end-to-end hardware evidence (VERDICT r3 "do this" #4).
# The reference's second first-class configuration: --downsample doubles the
# factor to 16 (DIP.py:271-276 + 0.07 reg noise DIP.py:320-323; 4-shuffle
# generator models/GAN/generator.py:55-58; eval_GAN.py:132).
# Data: synthetic DIV2K stand-in at /tmp/synth_x16 (tools/make_synth_div2k.py).
set -x
export JAX_COMPILATION_CACHE_DIR=.jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
OUT=/tmp/x16_runs
mkdir -p $OUT

echo "=== DIP x16 (2 images, 1000 iters, bf16, reg-noise 0.07 path) ==="
time python -m tpusr.cli.dip --data_dir /tmp/synth_x16 --out_dir $OUT \
  --num_iter 1000 --num_images 2 --dtype bfloat16 --downsample True \
  --train_log_freq 250 --save_output True || echo "DIP x16 FAILED rc=$?"

echo "=== GAN x16 brief train (4-shuffle generator, 300+100 epochs, bf16) ==="
time python -m tpusr.cli.train_gan --data_dir /tmp/synth_x16 --out_dir $OUT \
  --downsample True --num_images 8 --pre_train_epochs 300 \
  --fine_tune_epochs 100 --train_log_freq 100 --dtype bfloat16 \
  || echo "GAN x16 train FAILED rc=$?"

G=$(ls -t $OUT/trained/GANx16/*/fine_tuned_srgan_G.pth 2>/dev/null | head -1)
echo "=== GAN x16 eval (checkpoint: $G) ==="
time python -m tpusr.cli.eval_gan --data_dir /tmp/synth_x16 --out_dir $OUT \
  --model_path "$G" --downsample True --save_images True --dtype bfloat16 \
  || echo "GAN x16 eval FAILED rc=$?"

echo "=== DONE ==="
