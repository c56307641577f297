# NeRF-SR supersampling x2 on an LLFF scene (parity surface:
# reference scripts/train_llff_downX.sh — same flags incl. cadences)
dataset=${1:-fern}
root=${2:-./data/nerf_llff_data/$dataset}
W=504; H=378; downscale=2; batch_size=512
# if downscale=4, change batch_size=128 (reference note)
python train.py --name llff-${dataset}-${H}x${W}-ni64-ds${downscale} \
  --dataset_mode llff_downX --dataset_root $root \
  --checkpoints_dir ./checkpoints/nerf-sr --summary_dir ./logs/nerf-sr \
  --img_wh $W $H --batch_size $batch_size \
  --n_epochs 30 --n_epochs_decay 10 \
  --print_freq 100 --vis_freq 1000 --val_freq 1000 \
  --vis_epoch_freq 30 --val_epoch_freq 30 --save_epoch_freq 10 \
  --model nerf_downX --N_coarse 64 --N_importance 64 \
  --lr_policy exp --sigma_activation relu --lr 5e-4 --lr_final 5e-6 \
  --include_var --downscale ${downscale} \
  --scan_steps 20
