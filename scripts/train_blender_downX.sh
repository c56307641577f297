# NeRF-SR supersampling x2 on a blender scene
# (parity: reference scripts/train_blender_downX.sh)
dataset=${1:-lego}
root=${2:-./data/nerf_synthetic/$dataset}
python train_blender.py --name blender-down2-$dataset --dataset_mode blender_downX \
  --dataset_root $root --img_wh 200 200 --batch_size 512 --val_epoch_split test \
  --n_epochs 20 --n_epochs_decay 10 \
  --print_freq 100 --vis_freq 1000 --val_freq 1000 \
  --val_epoch_freq 20 --vis_epoch_freq 20 --save_epoch_freq 5 \
  --model nerf_downX --N_coarse 64 --N_importance 64 --downscale 2 \
  --lr_policy exp --sigma_activation relu --lr 5e-4 --lr_final 5e-6 \
  --scan_steps 20
