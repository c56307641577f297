# NeRF-SR supersampling x2 on an LLFF scene — TPU-native FAST config
# (the bench.py primary). Same experiment as train_llff_downX.sh but
# with `--fast_preset llff`, which expands to the validated NI=16
# slim two-round proposal config (--fast_sampling --N_importance 16
# --n_prop 48 --n_prop_levels 2 --n_prop2 24 --prop_pad_anneal_frac
# 0.5 --prop_pad_final 0.0 --prop_W 48 --prop_D 3): two slim proposal
# rounds shape the sampling CDF and the big MLP runs ONCE on 16
# points — a twelfth of the parity path's big-MLP evaluations, ~17x
# measured step throughput at at-or-above-parity PSNR/SSIM (README
# "Choosing a config"). FORWARD-FACING scenes only — config.py's
# guard refuses this preset on white-bkgd/360-degree datasets
# (measured -7.2 dB there; use --fast_preset blender instead).
dataset=${1:-fern}
root=${2:-./data/nerf_llff_data/$dataset}
W=504; H=378; downscale=2; batch_size=512
# if downscale=4, change batch_size=128 (reference note)
python train.py --name llff-${dataset}-${H}x${W}-fast16-ds${downscale} \
  --dataset_mode llff_downX --dataset_root $root \
  --checkpoints_dir ./checkpoints/nerf-sr --summary_dir ./logs/nerf-sr \
  --img_wh $W $H --batch_size $batch_size \
  --n_epochs 30 --n_epochs_decay 10 \
  --print_freq 100 --vis_freq 1000 --val_freq 1000 \
  --vis_epoch_freq 30 --val_epoch_freq 30 --save_epoch_freq 10 \
  --model nerf_downX --N_coarse 64 --fast_preset llff \
  --lr_policy exp --sigma_activation relu --lr 5e-4 --lr_final 5e-6 \
  --include_var --downscale ${downscale} \
  --scan_steps 20
